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


def test_zero_guard():
    assert cosine(np.zeros(4, dtype=np.float32), encode("x")[:4]) == 0.0
    assert cosine(np.array([]), np.array([1.0])) == 0.0


def test_batch_matches_single():
    texts = ["patent law", "", "patent law", "Paris, Texas"]
    mat = encode_batch(texts)
    assert mat.shape == (4, DIM)
    for i, t in enumerate(texts):
        assert np.array_equal(mat[i], encode(t))
