"""OWL/RDF-XML ontology scan (operator S1/P1-P3 of SURVEY.md §2).

The reference loads the whole file into an rdflib Graph and iterates all
triples to find ``(s, rdf:type, owl:Class)`` subjects, then projects
literals per predicate (/root/reference/app/lmss_parser.py:44-69).  Here
the ontology is a *small dimension input* (~10^4 classes), so it is
parsed once, driver-side, with stdlib ``xml.etree`` over the RDF/XML
class-element subset LMSS actually uses, and the result becomes a
DataFrame / broadcast artifact.  Large generic triple data flows through
the ``edges(subj,pred,obj)`` DataFrame path instead (graph/closure.py).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from pathlib import Path

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"
OWL_NS = "http://www.w3.org/2002/07/owl#"
SKOS_NS = "http://www.w3.org/2004/02/skos/core#"
DC_NS = "http://purl.org/dc/elements/1.1/"

OWL_THING = OWL_NS + "Thing"

# Label-prefix exclusion applied at parse time
# (/root/reference/app/lmss_parser.py:21,51).
EXCLUDED_LABEL_PREFIXES = ("ZZZ - SANDBOX: UNDER CONSTRUCTION",)

_KNOWN_PREFIXES = {
    "rdf": RDF_NS,
    "rdfs": RDFS_NS,
    "owl": OWL_NS,
    "skos": SKOS_NS,
    "dc": DC_NS,
}


def _ensure_namespace_decls(xml_text: str) -> str:
    """Inject missing xmlns declarations for well-known prefixes.

    The reference's own committed fixture (sample_ontology.owl) uses the
    ``skos:`` prefix without declaring it; be lenient so that file parses.
    """
    m = re.search(r"<rdf:RDF\b[^>]*>", xml_text)
    if not m:
        return xml_text
    header = m.group(0)
    missing = []
    for prefix, ns in _KNOWN_PREFIXES.items():
        if f"{prefix}:" in xml_text and f"xmlns:{prefix}" not in header:
            missing.append(f' xmlns:{prefix}="{ns}"')
    if not missing:
        return xml_text
    patched = header[:-1] + "".join(missing) + ">"
    return xml_text.replace(header, patched, 1)


def _texts(elem: ET.Element, tag: str) -> list[str]:
    out = []
    for child in elem.findall(tag):
        if child.text is not None and child.text.strip():
            out.append(child.text.strip())
    return out


def _resources(elem: ET.Element, tag: str) -> list[str]:
    out = []
    for child in elem.findall(tag):
        res = child.get(f"{{{RDF_NS}}}resource")
        if res:
            out.append(res)
        elif child.text and child.text.strip():
            out.append(child.text.strip())
    return out


def _first(values: list[str]) -> str:
    return values[0] if values else ""


def parse_owl_classes(path: str | Path) -> list[dict]:
    """Parse ``owl:Class`` elements into entity dicts.

    Output field set mirrors the reference's index record
    (/root/reference/app/lmss_parser.py:52-62); rows are returned in
    **sorted-IRI order** with an ``index_pos`` column — the frozen
    canonical index order required by the high-confidence fast path
    semantics (/root/reference/app/lmss_classification.py:75-84, SURVEY.md
    §7 deviation (e)).
    """
    text = _ensure_namespace_decls(Path(path).read_text())
    root = ET.fromstring(text)

    entities: dict[str, dict] = {}
    # DIRECT children of rdf:RDF only: a nested <owl:Class rdf:about=.../>
    # inside e.g. rdfs:subClassOf or owl:equivalentClass is a REFERENCE to
    # the class, not a (re)definition — root.iter() would let such a
    # reference overwrite the real record with an empty one
    for cls in root.findall(f"{{{OWL_NS}}}Class"):
        iri = cls.get(f"{{{RDF_NS}}}about")
        if not iri:
            continue
        label = _first(_texts(cls, f"{{{RDFS_NS}}}label"))
        if any(pfx in label for pfx in EXCLUDED_LABEL_PREFIXES):
            continue
        entities[iri] = {
            "rdf_about": iri,
            "rdfs_label": label,
            "description": _first(_texts(cls, f"{{{DC_NS}}}description")),
            "rdfs_seeAlso": _resources(cls, f"{{{RDFS_NS}}}seeAlso"),
            "skos_altLabel": _texts(cls, f"{{{SKOS_NS}}}altLabel"),
            "skos_definition": _first(_texts(cls, f"{{{SKOS_NS}}}definition")),
            "skos_example": _texts(cls, f"{{{SKOS_NS}}}example"),
            "skos_prefLabel": _first(_texts(cls, f"{{{SKOS_NS}}}prefLabel")),
            "subClassOf": _resources(cls, f"{{{RDFS_NS}}}subClassOf"),
        }

    rows = [entities[iri] for iri in sorted(entities)]
    for pos, row in enumerate(rows):
        row["index_pos"] = pos
    return rows
