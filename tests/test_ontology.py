"""Ontology build-stage tests: OWL scan (S1/P1-P3), closure (J4), top
classes (A2), branch map (J5), embeddings (A3)."""

import numpy as np
import pytest

from lmss_entity_extractor_spark.datagen.ontology_fixture import BASE, FIXTURE_CLASSES
from lmss_entity_extractor_spark.ontology import build_artifacts, parse_owl_classes


def test_parses_reference_sample_ontology():
    """The reference's committed fixture — including its undeclared skos:
    prefix — must parse (leniency mirrors rdflib tolerance)."""
    rows = parse_owl_classes("/root/reference/sample_ontology.owl")
    labels = {r["rdfs_label"] for r in rows}
    assert labels == {"Parent Class", "Child Class", "Another Class"}
    child = next(r for r in rows if r["rdfs_label"] == "Child Class")
    assert child["subClassOf"] == ["http://example.org/ontology#ParentClass"]
    assert child["skos_altLabel"] == ["Child Class Alternative Label"]
    assert child["skos_prefLabel"] == "Preferred Label for Child Class"


def test_sandbox_class_excluded(index_rows):
    assert not any("ZZZ - SANDBOX" in r["rdfs_label"] for r in index_rows)
    # and it is also absent from top classes later (P2 at both sites)


def test_index_rows_sorted_by_iri_with_positions(index_rows):
    iris = [r["rdf_about"] for r in index_rows]
    assert iris == sorted(iris)
    assert [r["index_pos"] for r in index_rows] == list(range(len(index_rows)))


def test_expected_class_count(index_rows):
    # all fixture classes except the sandbox-excluded one
    assert len(index_rows) == len(FIXTURE_CLASSES) - 1


def test_top_classes_sorted_by_label_with_counts(artifacts):
    labels = [t["label"] for t in artifacts.top_classes]
    assert labels == sorted(labels)
    assert set(labels) == {"Actor / Player", "Analytics Operation", "Area of Law", "Location"}
    area = next(t for t in artifacts.top_classes if t["label"] == "Area of Law")
    # strict descendants of AreaOfLaw in the fixture (sandbox excluded)
    expected = sum(
        1
        for lid, label, parent, _ in FIXTURE_CLASSES
        if not label.startswith("ZZZ") and parent not in (None, "__NONE__")
    )
    assert 0 < area["entities_count"] < expected  # sanity: counts strict subtree only


def test_closure_depths(artifacts):
    closure = {(d, a): dep for d, a, dep in artifacts.closure}
    pat = BASE + "PatentLaw"
    assert closure[(pat, pat)] == 0
    assert closure[(pat, BASE + "IPLaw")] == 1
    assert closure[(pat, BASE + "AreaOfLaw")] == 2
    assert closure[(pat, "http://www.w3.org/2002/07/owl#Thing")] == 3


def test_branch_map(artifacts):
    assert artifacts.branch_map[BASE + "PatentLaw"] == "Area of Law"
    assert artifacts.branch_map[BASE + "ParisTexas"] == "Location"
    assert artifacts.branch_map[BASE + "HashJoin"] == "Analytics Operation"
    # top class maps to itself (reference yields subject first)
    assert artifacts.branch_map[BASE + "Location"] == "Location"
    # orphan has no ancestors -> absent -> linker backfills "Unknown"
    assert (BASE + "OrphanConcept") not in artifacts.branch_map


def test_mean_matrix_normalized(artifacts):
    norms = np.linalg.norm(artifacts.mean_matrix, axis=1)
    embedded = artifacts.row_has_embedding
    assert np.allclose(norms[embedded], 1.0, atol=1e-5)
    assert np.allclose(norms[~embedded], 0.0)


def test_field_embeddings_fields(artifacts):
    fields = {f for _, f, _ in artifacts.field_embeddings}
    assert fields <= {"rdfs_label", "skos_definition", "skos_prefLabel", "skos_altLabel"}
    # every class embeds at least its label
    iris_with_label_vec = {i for i, f, _ in artifacts.field_embeddings if f == "rdfs_label"}
    assert iris_with_label_vec == set(artifacts.iris)


def test_surfaces_dictionary(artifacts):
    surf = {s for s, _ in artifacts.surfaces}
    assert "patent law" in surf
    assert "trademark disputes" in surf  # altLabel
    assert all(s == s.lower() for s in surf)


@pytest.mark.spark
def test_spark_closure_matches_bfs(spark, artifacts, index_rows):
    """J4 fixpoint self-join closure == driver-side BFS closure."""
    from lmss_entity_extractor_spark.graph.closure import transitive_closure

    edge_rows = [
        (r["rdf_about"], p) for r in index_rows for p in r.get("subClassOf", [])
    ]
    edges = spark.createDataFrame(edge_rows, "child string, parent string")
    got = {
        (r.desc_iri, r.anc_iri, r.depth)
        for r in transitive_closure(edges).collect()
    }
    # BFS closure includes self rows for indexed nodes; the Spark operator
    # adds self rows for every node appearing in the edge list (superset:
    # includes owl:Thing). Compare on the common node set.
    bfs = set(artifacts.closure)
    indexed = {r["rdf_about"] for r in index_rows}
    got_filtered = {(d, a, dep) for d, a, dep in got if d in indexed}
    bfs_filtered = {(d, a, dep) for d, a, dep in bfs if d in indexed}
    # BFS also contains nodes with no edges at all (orphan): self rows only
    orphan_selfs = {
        (d, a, dep) for d, a, dep in bfs_filtered if (d, a, dep) not in got_filtered
    }
    assert all(d == a and dep == 0 for d, a, dep in orphan_selfs)
    assert got_filtered - bfs_filtered == set()
    assert bfs_filtered - got_filtered == orphan_selfs


def test_nested_class_reference_does_not_overwrite_definition(tmp_path):
    """Regression: <owl:Class rdf:about="X"/> nested inside another
    class's subClassOf is a REFERENCE, not a redefinition — it must not
    erase X's parsed record."""
    from lmss_entity_extractor_spark.ontology import parse_owl_classes

    owl = tmp_path / "nested.owl"
    owl.write_text("""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
         xmlns:owl="http://www.w3.org/2002/07/owl#">
  <owl:Class rdf:about="http://x.org/A">
    <rdfs:label>Alpha Law</rdfs:label>
  </owl:Class>
  <owl:Class rdf:about="http://x.org/B">
    <rdfs:label>Beta Law</rdfs:label>
    <rdfs:subClassOf><owl:Class rdf:about="http://x.org/A"/></rdfs:subClassOf>
  </owl:Class>
</rdf:RDF>""")
    rows = {r["rdf_about"]: r for r in parse_owl_classes(owl)}
    assert rows["http://x.org/A"]["rdfs_label"] == "Alpha Law"
    assert rows["http://x.org/B"]["rdfs_label"] == "Beta Law"


def test_surface_regex_matches_punctuation_edged_surfaces():
    """Regression: a shared \\b around the whole alternation made
    surfaces starting/ending with punctuation unmatchable."""
    from lmss_entity_extractor_spark.ontology.artifacts import OntologyArtifacts

    arts = OntologyArtifacts.__new__(OntologyArtifacts)
    arts.surfaces = [("(ADR)", "iri1"), ("patent law", "iri2"), ("law.", "iri3")]
    arts._surface_regex = None
    rx = arts.surface_regex()
    assert rx.search("filed an (ADR) claim")
    assert rx.search("strong patent law here")
    assert not rx.search("patent lawyer")  # right boundary still enforced
