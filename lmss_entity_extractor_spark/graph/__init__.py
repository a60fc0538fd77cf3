from .closure import transitive_closure  # noqa: F401
from .triples import emit_triples  # noqa: F401
from .canonicalize import canonicalize_triples, build_nodes  # noqa: F401
from .export import edges_to_turtle  # noqa: F401
from .rdfs import rdfs_entail  # noqa: F401
from .sameas import sameas_mapping, sameas_resolve  # noqa: F401
from .shacl import validate_shapes  # noqa: F401
from .bgp import bgp_match, bgp_query, bgp_construct  # noqa: F401
from .proppath import property_path  # noqa: F401
from .ntriples import parse_ntriples, to_ntriples  # noqa: F401
from .er import match_pairs, resolve_entities  # noqa: F401
from .negsample import negative_samples  # noqa: F401
from .lpa import label_propagation  # noqa: F401
from .charsets import characteristic_sets  # noqa: F401
from .dictenc import term_dictionary, encode_triples, decode_triples  # noqa: F401
from .fusion import resolve_conflicts  # noqa: F401
from .hits import hits  # noqa: F401
from .void import (  # noqa: F401
    void_class_partitions,
    void_property_partitions,
    void_summary,
)
from .kcore import kcore  # noqa: F401
from .quotient import quotient_graph  # noqa: F401
from .temporal import coalesce_intervals  # noqa: F401
from .sssp import shortest_paths  # noqa: F401
from .incclosure import closure_insert  # noqa: F401
from .rdflist import flatten_lists  # noqa: F401
from .owlprops import owl_entail  # noqa: F401
from .reify import reify, unreify  # noqa: F401
from .bisim import bisimulation_classes  # noqa: F401
from .powerlaw import degree_distribution, power_law_fit  # noqa: F401
from .metrics import (  # noqa: F401
    modularity,
    degree_assortativity,
    reciprocity,
    conductance,
)
from .linkpred import link_prediction_scores, adamic_adar  # noqa: F401
from .richclub import rich_club  # noqa: F401
