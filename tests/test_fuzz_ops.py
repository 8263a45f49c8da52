"""Property-based checks for the round-2 operators: the image codec
round-trips arbitrary pixel buffers, and connected components agree with
a reference union-find on random graphs. Driver-side (no Spark jobs in
the hypothesis loop except the components check, which samples a few
random graphs explicitly instead)."""


from __future__ import annotations

import pytest

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from mtg_bulk_database_spark.operators.imagecodec import build_codec

codec = build_codec()


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=40),
    channels=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_png_roundtrip_arbitrary_pixels(w, h, channels, seed):
    rng = random.Random(seed)
    px = bytes(rng.randrange(256) for _ in range(w * h * channels))
    png = codec.png_encode(w, h, channels, px)
    assert codec.decode_header(png) == (w, h, channels)
    assert codec.png_decode(png) == (w, h, channels, px)


@settings(max_examples=60, deadline=None)
@given(data=st.binary(min_size=0, max_size=120))
def test_codec_never_crashes_on_junk(data):
    # malformed/truncated/garbage payloads must return None, not raise —
    # one bad blob must not fail a whole mapInPandas task
    codec.decode_header(data)
    codec.png_decode(data)
    # with a valid magic prepended, the parsers see plausible-prefix junk
    codec.png_decode(b"\x89PNG\r\n\x1a\n" + data)
    codec.decode_header(b"\x89PNG\r\n\x1a\n" + data)
    codec.decode_header(b"BM" + data)
    codec.decode_header(b"GIF89a" + data)
    codec.decode_header(b"\xff\xd8\xff" + data)


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=30),
    h=st.integers(min_value=1, max_value=30),
    nw=st.integers(min_value=1, max_value=30),
    nh=st.integers(min_value=1, max_value=30),
)
def test_resize_nearest_shape_contract(w, h, nw, nh):
    px = bytes((i * 31) % 256 for i in range(w * h * 3))
    out = codec.resize_nearest(w, h, 3, px, nw, nh)
    assert len(out) == nw * nh * 3


def _union_find_components(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@pytest.mark.slow
def test_connected_components_matches_union_find(spark):
    from mtg_bulk_database_spark.operators.graph import connected_components

    rng = random.Random(11)
    for trial in range(3):
        n_nodes, n_edges = 120, 90
        edges = [
            tuple(sorted(rng.sample(range(n_nodes), 2))) for _ in range(n_edges)
        ]
        expect = _union_find_components(edges)
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        # both execution modes must agree with the independent oracle:
        # local_threshold=0 forces the distributed label propagation,
        # the default takes the driver-local union-find tail solve
        for thresh in (0, 2_000_000):
            got = {
                r["node"]: r["component"]
                for r in connected_components(
                    pairs, max_iter=60, local_threshold=thresh
                ).collect()
            }
            assert got == expect, (
                f"trial {trial} (local_threshold={thresh}) diverged from union-find"
            )


@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), max_size=200
    ),
    rate=st.integers(min_value=1, max_value=192_000),
    channels=st.integers(min_value=1, max_value=4),
)
@settings(max_examples=60, deadline=None)
def test_wav_roundtrip_arbitrary_samples(samples, rate, channels):
    from mtg_bulk_database_spark.operators.audiocodec import (
        wav_encode,
        wav_parse,
    )

    samples = samples[: len(samples) - (len(samples) % channels)]
    assert wav_parse(wav_encode(samples, rate, channels)) == (
        channels,
        rate,
        samples,
    )


@given(data=st.binary(min_size=0, max_size=200))
@settings(max_examples=120, deadline=None)
def test_wav_parse_never_crashes_on_junk(data):
    from mtg_bulk_database_spark.operators.audiocodec import wav_parse

    out = wav_parse(data)
    assert out is None or (
        isinstance(out, tuple) and len(out) == 3 and out[0] >= 1
    )
    # adversarial: junk wearing the RIFF/WAVE magic
    out2 = wav_parse(b"RIFF" + data[:4] + b"WAVE" + data)
    assert out2 is None or isinstance(out2, tuple)


@given(
    counts=st.lists(
        st.integers(min_value=1, max_value=10_000), min_size=1, max_size=12
    ),
    budget_frac=st.sampled_from([0.25, 0.5, 0.75]),
)
@settings(max_examples=25, deadline=None)
def test_temperature_targets_never_exceed_budget(counts, budget_frac):
    """The per-source floor allocation can never oversubscribe the
    global budget: Σ floor(w_s·B/Σw) ≤ B for any count distribution —
    the driver-side arithmetic replicated exactly (floor-micro
    weights), so the property holds for the distributed op too."""
    import math

    w = [math.floor(math.sqrt(n) * 1_000_000.0) for n in counts]
    denom = sum(w)
    budget = math.floor(sum(counts) * budget_frac)
    targets = [math.floor((wi * budget) / denom) for wi in w]
    assert sum(targets) <= budget
    assert all(t >= 0 for t in targets)


def _q240_closed_form(counts: dict, cap: int, budget: int) -> dict:
    """Exact Python replica of q240's closed-form algebra (the same
    integer ops the Spark body and the DuckDB twin run)."""
    rows = sorted(counts.items(), key=lambda kv: (kv[1], kv[0]))
    n_src = len(rows)
    cum = m = cum_m = 0
    for i, (_, n) in enumerate(rows, start=1):
        cum += cap * n
        if cap * n * (n_src - i + 1) <= budget - (cum - cap * n):
            m, cum_m = i, cum
    out = {}
    for i, (s, n) in enumerate(rows, start=1):
        if i <= m:
            out[s] = cap * n
        else:
            base, rem = divmod(budget - cum_m, n_src - m)
            out[s] = base + (1 if i - m <= rem else 0)
    return out


def _waterfill_reference(counts: dict, cap: int, budget: int) -> dict:
    """Independent ITERATIVE waterfilling: repeatedly give the
    smallest remaining source min(cap·n, fair share); once a source
    rejects the cap, every larger one does too (sorted ascending), so
    the rest split the remainder uniformly with the deterministic
    remainder-to-smallest rule."""
    rows = sorted(counts.items(), key=lambda kv: (kv[1], kv[0]))
    remaining, k, out = budget, len(rows), {}
    for i, (s, n) in enumerate(rows):
        if k and cap * n <= remaining // k:
            out[s] = cap * n
            remaining -= cap * n
            k -= 1
        else:
            base, rem = divmod(remaining, k)
            for j, (s2, _) in enumerate(rows[i:]):
                out[s2] = base + (1 if j < rem else 0)
            break
    return out


@given(
    counts=st.lists(
        st.integers(min_value=0, max_value=10_000),
        min_size=1, max_size=12,
    ),
    cap=st.sampled_from([1, 2, 3]),
    num_den=st.sampled_from([(0, 1), (1, 4), (39, 20), (3, 1), (7, 2)]),
)
@settings(max_examples=200, deadline=None)
def test_q240_closed_form_equals_iterative_waterfilling(
    counts, cap, num_den
):
    """The q240 waterline is computed WITHOUT iteration (one window +
    one MAX); this pins the closed form against an independent
    iterative simulation over random count distributions, budgets from
    zero to 3.5x the corpus, ties, and zero-token sources — including
    the prefix-closedness of the cap predicate the closed form relies
    on (MAX-true-index == first-false-index - 1)."""
    cts = {f"s{i:02d}": n for i, n in enumerate(counts)}
    total = sum(cts.values())
    budget = (num_den[0] * total) // num_den[1]
    got = _q240_closed_form(cts, cap, budget)
    ref = _waterfill_reference(cts, cap, budget)
    assert got == ref
    spent = sum(got.values())
    assert spent == min(budget, cap * total)
    for s, a in got.items():
        assert 0 <= a <= max(cap * cts[s], budget)
