"""Sequence packing (operators/textops.pack_stream / pack_greedy).

The gates verify both disciplines against SQL replicas on the documents
table; these tests pin the semantics on crafted lengths — straddling,
exact fits, and over-long documents.
"""

import pandas as pd

from sis_spark.operators.textops import pack_greedy, pack_stream


def _docs(spark, lens):
    # doc i gets exactly lens[i] whitespace tokens ("a a a ... a")
    rows = [(i, " ".join(["a"] * n)) for i, n in enumerate(lens)]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]), "doc_id long, text string"
    )


def test_pack_stream_straddles_and_tiles(spark):
    lens = [100, 100, 100, 56, 300]  # one shard; 656 tokens over cap=256
    out = {r["doc_id"]: r for r in
           pack_stream(_docs(spark, lens), capacity=256, shards=1).collect()}
    # doc 2 starts at token 200 -> straddles windows 0 and 1
    assert (out[2]["start_bin"], out[2]["start_off"], out[2]["end_bin"]) == (0, 200, 1)
    # doc 3 ends exactly at the window-1 boundary (tokens 300..355)
    assert (out[3]["start_bin"], out[3]["end_bin"]) == (1, 1)
    # doc 4 (300 tokens > capacity) spans windows 1 and 2
    assert (out[4]["start_bin"], out[4]["start_off"], out[4]["end_bin"]) == (1, 100, 2)
    # the stream is gapless: each doc starts where the previous ended
    pos = 0
    for i, n in enumerate(lens):
        assert out[i]["start_bin"] * 256 + out[i]["start_off"] == pos
        pos += n


def test_pack_greedy_no_straddle_and_overlong(spark):
    lens = [100, 100, 100, 56, 300, 10]
    out = {r["doc_id"]: (r["bin"], r["off"]) for r in
           pack_greedy(_docs(spark, lens), capacity=256, shards=1).collect()}
    assert out[0] == (0, 0) and out[1] == (0, 100)
    assert out[2] == (1, 0)          # 100 doesn't fit in remaining 56
    assert out[3] == (1, 100)
    assert out[4] == (2, 0)          # over-long doc gets its own bin
    assert out[5] == (3, 0)          # next doc opens a fresh bin
    # invariant: within a bin, docs never exceed capacity unless alone
    bins = {}
    for i, n in enumerate(lens):
        bins.setdefault(out[i][0], []).append(n)
    for members in bins.values():
        assert sum(members) <= 256 or len(members) == 1


def test_pack_sharding_is_disjoint(spark):
    lens = list(range(1, 41))
    rows = pack_greedy(_docs(spark, lens), capacity=64, shards=4).collect()
    assert len(rows) == 40
    for r in rows:
        assert r["shard"] == r["doc_id"] % 4


# ---------------------------------------------------------------- property suite

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(lens=st.lists(st.integers(1, 400), min_size=1, max_size=60),
       cap=st.sampled_from([64, 256]))
def test_pack_properties(spark, lens, cap):
    sdf = _docs(spark, lens)
    # stream: gapless concatenation, end position consistent
    srows = {r["doc_id"]: r for r in pack_stream(sdf, cap, shards=1).collect()}
    pos = 0
    for i, n in enumerate(lens):
        r = srows[i]
        assert r["start_bin"] * cap + r["start_off"] == pos
        assert r["end_bin"] == (pos + n - 1) // cap
        pos += n
    # greedy: reference model equality + capacity invariant
    grows = {r["doc_id"]: (r["bin"], r["off"]) for r in
             pack_greedy(sdf, cap, shards=1).collect()}
    b = used = 0
    for i, n in enumerate(lens):
        if used + n > cap and used > 0:
            b, used = b + 1, 0
        assert grows[i] == (b, used), (i, n, cap)
        used += n
