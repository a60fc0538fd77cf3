"""Deterministic encoder tests (F8 stand-in, SURVEY.md §7 hard part 6)."""

import numpy as np

from lmss_entity_extractor_spark.encoder import DIM, cosine, encode, encode_batch


def test_determinism_across_calls():
    a = encode("patent law")
    b = encode("patent law")
    assert np.array_equal(a, b)


def test_unit_norm():
    v = encode("trade secret litigation")
    assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-6


def test_dim():
    assert encode("x").shape == (DIM,)


def test_empty_is_zero_vector():
    assert float(np.linalg.norm(encode(""))) == 0.0
    assert float(np.linalg.norm(encode("!!!"))) == 0.0


def test_case_and_punct_invariance():
    # encoder normalizes via full_process -> same vector
    assert np.array_equal(encode("Patent-Law"), encode("patent law"))


def test_identical_text_cosine_one():
    assert abs(cosine(encode("copyright infringement"), encode("copyright infringement")) - 1.0) < 1e-6


def test_related_texts_more_similar_than_unrelated():
    sim_close = cosine(encode("patent law"), encode("patent laws"))
    sim_far = cosine(encode("patent law"), encode("zebra quantum banana"))
    assert sim_close > sim_far


# --------------------------------------------------------------------------
# pluggable encoder seam (F8)
# --------------------------------------------------------------------------


def test_get_encoder_singleton_and_unknown_spec():
    import pytest

    from lmss_entity_extractor_spark.encoder import get_encoder

    a = get_encoder("hashed-v1")
    assert a is get_encoder("hashed-v1")  # per-process lazy singleton
    with pytest.raises(KeyError, match="register_encoder"):
        get_encoder("no-such-model")


def test_alternative_encoder_changes_dim_and_vectors():
    from lmss_entity_extractor_spark.encoder import get_encoder

    toy = get_encoder("hashed-md5-32")
    v = toy.encode("patent law")
    assert v.shape == (32,)
    assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-6
    assert np.array_equal(v, toy.encode("patent law"))
    b = toy.encode_batch(["patent law", "x"])
    assert b.shape == (2, 32) and np.array_equal(b[0], v)
    assert toy.encode_batch([]).shape == (0, 32)


def test_qualified_spec_imports_registering_module():
    """'module:name' specs self-resolve by importing the module (which
    registers at import time) — the executor-side path for third-party
    encoders shipped via --py-files."""
    import sys
    from pathlib import Path

    import pytest

    from lmss_entity_extractor_spark import encoder as enc_mod
    from lmss_entity_extractor_spark.encoder import get_encoder

    tests_dir = str(Path(__file__).resolve().parent)
    if tests_dir not in sys.path:
        sys.path.insert(0, tests_dir)
    # simulate a fresh worker process: module not imported, spec unknown
    sys.modules.pop("toy_encoder", None)
    enc_mod._encoder_registry.pop("toy_encoder:test-sha1-24", None)
    enc_mod._encoder_singletons.pop("toy_encoder:test-sha1-24", None)

    toy = get_encoder("toy_encoder:test-sha1-24")
    assert toy.dim == 24
    assert toy is get_encoder("toy_encoder:test-sha1-24")  # singleton
    with pytest.raises(ModuleNotFoundError):
        get_encoder("no_such_module:model")
    with pytest.raises(KeyError, match="qualified"):
        get_encoder("toy_encoder:wrong-name")  # module imports, name absent


def test_artifacts_stamp_encoder_spec_and_dim():
    from lmss_entity_extractor_spark.datagen import write_fixture_owl
    from lmss_entity_extractor_spark.ontology import build_artifacts, parse_owl_classes

    import tempfile

    owl = tempfile.mktemp(suffix=".owl")
    write_fixture_owl(owl)
    rows = parse_owl_classes(owl)
    default = build_artifacts(rows)
    toy = build_artifacts(rows, encoder_spec="hashed-md5-32")
    assert default.encoder_spec == "hashed-v1" and default.mean_matrix.shape[1] == DIM
    assert toy.encoder_spec == "hashed-md5-32" and toy.mean_matrix.shape[1] == 32
    # the two models disagree — scores must come from the stamped model
    assert not np.array_equal(default.mean_matrix[:, :32], toy.mean_matrix)


def test_toy_encoder_end_to_end_parity(spark, tiny_transcripts, owl_path, warehouse):
    """Swap the encoder via the seam and the whole distributed pipeline
    (broadcast artifacts -> executor-side Linker resolving the spec ->
    canonical edges) must still match the loop oracle exactly — the
    VERDICT r1 'done' criterion for F8."""
    import pytest

    pytest.importorskip("pyspark")
    from lmss_entity_extractor_spark.datagen.transcripts import rows_to_pandas
    from lmss_entity_extractor_spark.ontology import build_artifacts, parse_owl_classes
    from lmss_entity_extractor_spark.oracle import oracle_triples
    from lmss_entity_extractor_spark.pipeline import KGPipeline, PipelineConfig

    cfg = PipelineConfig(output_partitions=8, encoder_spec="hashed-md5-32")
    pipe = KGPipeline(spark, owl_path, warehouse / "toy_enc", cfg)
    assert pipe.artifacts.encoder_spec == "hashed-md5-32"
    out = pipe.run(spark.createDataFrame(rows_to_pandas(tiny_transcripts)))
    got = {(r.subj, r.pred, r.obj) for r in out["edges"].select("subj", "pred", "obj").collect()}

    arts = build_artifacts(parse_owl_classes(owl_path), encoder_spec="hashed-md5-32")
    want = oracle_triples([(c, t, x) for c, t, _, x, _, _ in tiny_transcripts], arts)
    assert want and got == want


def test_zero_guard():
    assert cosine(np.zeros(4, dtype=np.float32), encode("x")[:4]) == 0.0
    assert cosine(np.array([]), np.array([1.0])) == 0.0


def test_batch_matches_single():
    texts = ["patent law", "", "patent law", "Paris, Texas"]
    mat = encode_batch(texts)
    assert mat.shape == (4, DIM)
    for i, t in enumerate(texts):
        assert np.array_equal(mat[i], encode(t))
