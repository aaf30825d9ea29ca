"""Property tests: the polars-vectorized text kernels must agree with the
plain-Python references on arbitrary (incl. unicode / whitespace-weird)
inputs."""

import numpy as np
from hypothesis import given, settings, strategies as st

from nfl_feature_store_ray.functions import textfuncs as tf

texts_st = st.lists(
    st.one_of(
        st.none(),
        st.text(max_size=60),
        st.text(alphabet=" abcde", max_size=40),  # space-heavy
    ),
    min_size=0, max_size=20,
)


@settings(max_examples=60, deadline=None)
@given(texts=texts_st, k=st.integers(min_value=2, max_value=5))
def test_shingle_flat_matches_shingle_set(texts, k):
    counts, flat = tf.shingle_flat(texts, k=k)
    assert len(counts) == len(texts)
    i = 0
    for t, c in zip(texts, counts):
        got = sorted(flat[i : i + c]); i += c
        want = sorted(tf.shingle_set(t or "", k))
        assert got == want, (t, k)
    assert i == len(flat)


@settings(max_examples=60, deadline=None)
@given(texts=texts_st)
def test_token_flat_matches_token_split(texts):
    counts, flat = tf.token_flat(texts)
    i = 0
    for t, c in zip(texts, counts):
        got = list(flat[i : i + c]); i += c
        assert got == tf.token_split((t or "").lower()), t
    assert i == len(flat)


@settings(max_examples=30, deadline=None)
@given(
    xs=st.lists(st.integers(min_value=0, max_value=(1 << 31) - 2), min_size=1,
                max_size=300),
)
def test_minhash_fold_equals_modulo(xs):
    a, b = tf.minhash_params(16)
    x = np.asarray(xs, dtype=np.uint64)
    counts = np.array([len(xs)], dtype=np.int64)
    sig = tf.minhash_from_flat(x, counts, a, b)
    p = np.uint64((1 << 31) - 1)
    ref = np.min((a[None, :] * x[:, None] + b[None, :]) % p, axis=0)
    assert (sig[0] == ref).all()
