"""Stream-vs-batch equivalence for streaming_triple_merge: the final
state per (subj, pred, obj) after N microbatches must equal the batch
groupBy over the same rows (support exact, first_seen = min doc,
provenance = lowest MAX_PROVENANCE docs), and a hot triple's state
must actually span batches."""

from __future__ import annotations


def test_streaming_triple_merge_matches_batch(spark, tmp_path):
    from jerex_spark.streaming import (MAX_PROVENANCE,
                                       streaming_triple_merge)
    src = str(tmp_path / "triples_in")
    # one hot identity (3 of every 4 rows) + a long tail, several docs
    rows = []
    for i in range(120):
        if i % 4:
            rows.append(("acme corp", "founded_in", "berlin",
                         f"src0/{i:03d}"))
        else:
            rows.append((f"e{i}", "located_in", f"c{i % 7}",
                         f"src1/{i:03d}"))
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, doc_key string")
    df.repartition(5).write.parquet(src)

    stream = (spark.readStream
              .schema("subj string, pred string, obj string, "
                      "doc_key string")
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = (streaming_triple_merge(stream)
         .writeStream.format("memory").queryName("triple_merge")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)

    final = spark.sql("""
        select subj, pred, obj, support, n_batches, first_seen,
               provenance
        from (select *, row_number() over (
                  partition by subj, pred, obj
                  order by n_batches desc, support desc) rn
              from triple_merge) where rn = 1""").collect()
    got = {(r.subj, r.pred, r.obj): r for r in final}

    expect: dict[tuple, list] = {}
    for s, p, o, d in rows:
        expect.setdefault((s, p, o), []).append(d)
    assert set(got) == set(expect)
    for key, docs in expect.items():
        r = got[key]
        assert r.support == len(docs)
        assert r.first_seen == min(docs)
        assert r.provenance == sorted(set(docs))[:MAX_PROVENANCE]
    hot = got[("acme corp", "founded_in", "berlin")]
    assert hot.support == 90
    assert hot.n_batches > 1          # state really spanned microbatches
    assert len(hot.provenance) == MAX_PROVENANCE
