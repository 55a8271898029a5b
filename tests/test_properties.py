"""Property-based tests (hypothesis): the reference's type-inference
semantics, sketch accuracy bounds, and codec round-trips hold for
arbitrary inputs, not just the golden fixtures."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from invalid_spark import codecs
from invalid_spark.checks.stats import TDigest
from invalid_spark import yamlmeta


# ---------------------------------------------------------------------------
# YAML core-schema inference (reference yaml.go:256-276 semantics)

@given(st.integers(min_value=-(10**18), max_value=10**18))
def test_int_spellings_infer_int(i):
    assert yamlmeta.infer_tag(str(i)) == "!!int"


@given(st.floats(allow_nan=False, allow_infinity=False, width=64))
def test_float_spellings_infer_number(x):
    tag = yamlmeta.infer_tag(repr(x))
    # repr of a float is either int-like ("1e+20" style counts float;
    # "2.0" float; integral reprs never occur from repr())
    assert tag in ("!!int", "!!float")
    if "." in repr(x) or "e" in repr(x) or "E" in repr(x):
        assert tag == "!!float"


@given(st.text(min_size=1, max_size=30))
def test_quoted_always_str(s):
    assert yamlmeta.infer_tag(s, quoted=True) == "!!str"


@given(st.sampled_from(["y", "n", "yes", "no", "Yes", "No", "on", "off", "ON"]))
def test_yaml11_bools_are_strings(s):
    # reference asserts YAML 1.1 bools stay strings (yaml_test.go:140-165)
    assert yamlmeta.infer_tag(s) == "!!str"


@given(st.sampled_from(["true", "True", "TRUE", "false", "False", "FALSE"]))
def test_core_bools(s):
    assert yamlmeta.infer_tag(s) == "!!bool"


@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz_ ", min_size=1, max_size=30))
def test_plain_words_are_str(s):
    if s.strip() == "" or s in ("null",):
        return
    assert yamlmeta.infer_tag(s) == "!!str"


@given(st.integers(min_value=0, max_value=10**12))
def test_inference_matches_reference_hex_octal(i):
    assert yamlmeta.infer_tag(hex(i)) == "!!int"
    assert yamlmeta.infer_tag(oct(i).replace("0o", "0o")) == "!!int"


# ---------------------------------------------------------------------------
# t-digest accuracy

@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=20,
        max_size=2000,
    ),
    st.sampled_from([0.1, 0.25, 0.5, 0.75, 0.9]),
)
def test_tdigest_quantile_rank_error(values, q):
    arr = np.array(values, dtype=np.float64)
    d = TDigest.of(arr, compression=100.0)
    est = d.quantile(q)
    # the estimate's rank INTERVAL (ties span a range) must come
    # within 10% of the target rank
    s = np.sort(arr)
    lo = np.searchsorted(s, est, side="left") / len(arr)
    hi = np.searchsorted(s, est, side="right") / len(arr)
    tol = 0.1 + 2.0 / len(arr)
    assert lo - tol <= q <= hi + tol


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1e3, max_value=1e3, allow_nan=False),
        min_size=10, max_size=500,
    ),
    st.lists(
        st.floats(min_value=-1e3, max_value=1e3, allow_nan=False),
        min_size=10, max_size=500,
    ),
)
def test_tdigest_merge_equivalent_to_whole(a, b):
    whole = TDigest.of(np.array(a + b))
    merged = TDigest.of(np.array(a)).merge(TDigest.of(np.array(b)))
    for q in (0.25, 0.5, 0.75):
        w, m = whole.quantile(q), merged.quantile(q)
        arr = np.sort(np.array(a + b))
        rw = np.searchsorted(arr, w, side="right") / len(arr)
        rm = np.searchsorted(arr, m, side="right") / len(arr)
        assert abs(rw - rm) <= 0.15


# ---------------------------------------------------------------------------
# codecs

@settings(max_examples=25, deadline=None)
@given(st.integers(min_value=1, max_value=24), st.integers(min_value=1, max_value=24),
       st.integers(min_value=0, max_value=2**31 - 1))
def test_png_roundtrip_arbitrary(h, w, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(codecs.decode_png(codecs.encode_png(px)), px)


@settings(max_examples=25, deadline=None)
@given(st.integers(min_value=8, max_value=32), st.integers(min_value=0, max_value=2**31 - 1))
def test_lossy_roundtrip_psnr(side, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(side, side, 3), dtype=np.uint8)
    dec = codecs.decode_image(codecs.encode_image(px, "jpeg"))
    assert codecs.psnr(px, dec) >= 40.0


@settings(max_examples=25, deadline=None)
@given(st.binary(min_size=0, max_size=64))
def test_garbage_never_decodes_silently(raw):
    try:
        px = codecs.decode_image(raw)
    except codecs.DecodeError:
        return
    # if it decoded, it must be a well-formed pixel array
    assert px.ndim == 3 and px.shape[2] == 3


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=50), min_size=0, max_size=60),
    st.integers(min_value=1, max_value=40),
)
def test_greedy_pack_matches_naive_loop(tokens, cap):
    """pack.greedy_pack's searchsorted boundaries equal the naive
    per-document greedy loop for any token vector and budget."""
    import numpy as np

    from invalid_spark.pipeline.pack import greedy_pack

    seq, off = greedy_pack(np.array(tokens, dtype="int64"), cap)
    # the reference loop, straight from the documented rule
    fill, s = 0, 0
    for i, t in enumerate(tokens):
        if fill > 0 and fill + t > cap:
            s += 1
            fill = 0
        assert seq[i] == s, (tokens, cap, i)
        assert off[i] == fill, (tokens, cap, i)
        fill += t
