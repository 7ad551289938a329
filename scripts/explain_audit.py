#!/usr/bin/env python
"""Physical-plan audit: dump .explain('formatted') for the engine's key plans and
assert the properties that matter at 100 TB:

- parquet scans carry PushedFilters / narrow ReadSchema (pruning works)
- the dedup aggregation is HashAggregate with a partial_ pass before the exchange
  (map-side combine)
- the LSH bucket join and verify join are shuffle/broadcast as intended
- WholeStageCodegen spans cover the JVM-side expressions

Writes PLANS.md. Run: python scripts/explain_audit.py
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    from pyspark.sql import functions as F

    from corpus_dedup_spark.config import DedupConfig
    from corpus_dedup_spark.operators.exact_dedup import (dedup_keepers,
                                                          explode_units)
    from corpus_dedup_spark.operators.minhash_lsh import (band_explode,
                                                          doc_features,
                                                          verify_jaccard)
    from corpus_dedup_spark.operators.search import (build_fingerprint_index,
                                                     search)
    from corpus_dedup_spark.plans.session import build_session

    import tempfile

    spark = build_session(
        master="local[4]", shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir":
                    tempfile.mkdtemp(prefix="plans_audit_wh_")})
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = docs.selectExpr("cast(doc_id as string) as url", "text", "lang",
                            "n_chars")
    cfg = DedupConfig()

    sections: list[tuple[str, str, list[str]]] = []

    # 1. scan pruning: filter + projection must reach the parquet scan
    q = docs.filter(F.col("lang") == "en").select("doc_id", "n_chars")
    sections.append((
        "Parquet scan pruning (filter pushdown + column pruning)",
        plan_of(q),
        ["PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]",
         # pruned to the 3 needed columns (lang kept for the filter) of the 5 in file
         "ReadSchema: struct<doc_id:bigint,lang:string,n_chars:bigint>"],
    ))

    # 2. dedup keeper aggregation: partial hash agg before the exchange
    units = explode_units(pages)
    keepers = dedup_keepers(units)
    sections.append((
        "Exact-dedup keeper aggregation (map-side combine before shuffle)",
        plan_of(keepers),
        ["partial_min", "partial_count", "hashpartitioning(_h"],
    ))

    # 2b. flat-Arrow extraction pipeline: scan → MapInArrow (flat units, no
    # explode stage) → partial-combined keeper aggregation
    from corpus_dedup_spark.operators.exact_dedup import explode_units_arrow

    keepers_arrow = dedup_keepers(explode_units_arrow(pages))
    sections.append((
        "Flat-Arrow extraction feeding the keeper aggregation (MapInArrow, "
        "no explode stage, partial agg before the exchange)",
        plan_of(keepers_arrow),
        ["MapInArrow", "partial_min", "hashpartitioning(_h", "!Generate"],
    ))

    # 2c. pipeline units stage: extraction alone (what plans/pipeline.py writes
    # as its first checkpoint) is a pure map — NO shuffle touches the
    # per-occurrence unit stream; dedup happens in the next stage's partial agg
    sections.append((
        "Pipeline units stage (map-only extraction checkpoint: no Exchange, "
        "no Window over the occurrence stream)",
        plan_of(explode_units_arrow(pages)),
        ["MapInArrow", "!Exchange", "!Window", "!Sort"],
    ))

    # 3. LSH candidate generation: ONE groupBy into capped buckets + streamed
    # explodes; hot buckets removed by a broadcast ANTI-join before any collect
    from corpus_dedup_spark.operators.minhash_lsh import candidate_pairs

    feats = doc_features(pages, cfg)
    pairs, _dropped = candidate_pairs(band_explode(feats, cfg), cfg)
    sections.append((
        "LSH candidate pairs (broadcast anti-join of hot buckets -> bucket "
        "collect_list -> streamed pair explode)",
        plan_of(pairs),
        ["LeftAnti", "collect_list", "Generate", "explode(",
         "hashpartitioning(band_id"],
    ))

    # 4. verify join (pairs back to packed shingle blobs) — ONE Arrow-batched
    # UDF evaluation (a deterministic UDF lets the threshold filter push through
    # the projection and re-evaluate it; asNondeterministic pins one eval), and
    # the downstream threshold filter must NOT re-run it
    pairs_df = spark.createDataFrame([("a", "b")], ["id_a", "id_b"])
    ver = verify_jaccard(pairs_df, feats, cfg).filter(
        F.col("jaccard") >= F.lit(cfg.jaccard_threshold))
    ver_plan = plan_of(ver)
    sections.append((
        "Exact-Jaccard verify join (one Arrow-batched inter/union eval, "
        "threshold filter does not duplicate the UDF)",
        ver_plan,
        ["inter_union", "ArrowEvalPython"]
        + (["!__DUP_UDF__"] if ver_plan.count("inter_union(") == 1
           else ["__DUP_UDF__"]),
    ))

    # 5. search probe: fingerprint filter + substring verify
    idx = build_fingerprint_index(pages, window=10)
    hits = search(idx, pages, "table scan")
    sections.append((
        "Rabin-Karp search probe (filter + verify; no full-text shuffle)",
        plan_of(hits),
        ["Filter"],
    ))

    # 6. shared-block pairs: hot-fingerprint cap must be a broadcast anti-join,
    # never a Window sort-shuffle of the docs x chars fingerprint index
    from corpus_dedup_spark.operators.block_dups import shared_block_pairs

    sbp = shared_block_pairs(pages, window=32)
    sections.append((
        "Shared-block pairs (groupBy sizes + broadcast anti-join; NO window over "
        "the fingerprint index; dual-hash verify -> NO text column in any join)",
        plan_of(sbp),
        ["LeftAnti", "whash2", "!Window", "!substring"],
    ))

    # 6b. block tree: the whole per-doc recursion is ONE map pass — no Exchange,
    # no per-level text join anywhere in the construction plan
    from corpus_dedup_spark.operators.block_tree import build_block_tree

    # subset via filter, not limit — GlobalLimit itself inserts an Exchange and
    # would mask the property under audit (the operator adds none)
    bt = build_block_tree(pages.filter(F.col("n_chars") < 200))
    sections.append((
        "Block-tree construction (single worker-side MapInPandas; no Exchange, "
        "no per-level joins)",
        plan_of(bt),
        ["MapInPandas", "!Exchange", "!SortMergeJoin", "!BroadcastHashJoin"],
    ))

    # 6c. bucketed incremental dedup: corpus state written with
    # write_corpus_state (bucketBy norm_unit — the parquet stand-in for
    # Iceberg bucket(norm_unit, N)) makes the anti-join CO-LOCATED: the
    # bucketed scan's HashPartitioning(norm_unit) satisfies the join's
    # required distribution, so the 10^12-unit corpus side gets NO Exchange —
    # only the (small) new batch shuffles, to the bucket count. Broadcast is
    # disabled here to audit the distributed path a real corpus state takes.
    from corpus_dedup_spark.operators.exact_dedup import write_corpus_state

    write_corpus_state(
        explode_units_arrow(pages.limit(50)).select("norm_unit").distinct(),
        "plans_audit_corpus_state", buckets=8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    inc = explode_units_arrow(pages).join(
        spark.table("plans_audit_corpus_state"), "norm_unit", "left_anti")
    inc_plan = plan_of(inc)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    sections.append((
        "Bucketed incremental dedup (corpus state bucketBy(norm_unit): "
        "anti-join corpus side exchange-FREE, only the new batch shuffles)",
        inc_plan,
        ["Bucketed: true", "LeftAnti"]
        # formatted explain puts the operator name and its arguments on
        # separate lines — count the detail-section headers "(n) Exchange"
        + (["!__EXTRA_EXCHANGE__"]
           if len(re.findall(r"\(\d+\) Exchange", inc_plan)) == 1
           else ["__EXACTLY_ONE_EXCHANGE__"]),
    ))

    # 6d. ExactSubstr duplicated spans: per-position hashes come from the
    # O(n) rolling-hash kernel (ONE ArrowEvalPython — the same pass the
    # search index persists), so no window text is materialized for unique
    # positions; the prefilter aggregation shuffles ONLY the 8-byte hash, and
    # window text is cut by substring solely for hash-survivors (the
    # `substring(text, pos` projection after the survivor join); the island
    # merge is a per-doc window over duplicated positions alone.
    from corpus_dedup_spark.operators.exact_substr import \
        duplicate_substring_spans

    es = duplicate_substring_spans(
        pages.selectExpr("url AS doc_id", "text"), window=40)
    es_plan = plan_of(es)
    # the hot-hash exchange must not carry any text: the aggregate feeding
    # hashpartitioning(_h) prunes to the hash column only
    hot_agg = re.search(
        r"\(\d+\) HashAggregate[^\n]*\nInput \[1\]: \[_h#\d+L\]", es_plan)
    sections.append((
        "ExactSubstr duplicate spans (O(n) rolling-hash kernel, computed "
        "once and persisted for both consumers; hash-only prefilter "
        "exchange; window text cut only for survivors; island merge windows "
        "only duplicated positions)",
        es_plan,
        # InMemoryTableScan = the persisted kernel pass is REUSED by the
        # hot-hash agg and the survivor join instead of re-running
        ["ArrowEvalPython", "InMemoryTableScan", "hashpartitioning(_h",
         "substring(text", "!BatchEvalPython", "!CartesianProduct"]
        + (["!__HOT_AGG_CARRIES_TEXT__"] if hot_agg
           else ["__HOT_AGG_INPUT_IS_HASH_ONLY__"]),
    ))

    # 6e. IVF ANN: the K centroids reach every vector via a broadcast
    # nested-loop join (NEVER a CartesianProduct shuffle), and the cell
    # assignment collapses the N×K scored stream with a partial_max aggregate
    # before its exchange — no window over the cross product.
    from corpus_dedup_spark.operators.ivf_ann import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding")
    ivf = ivf_topk(emb, emb.filter("vec_id < 20"), k=3, n_centroids=8,
                   nprobe=2)
    sections.append((
        "IVF ANN top-k (broadcast centroids; partial-combining argmax "
        "assignment; no cartesian shuffle)",
        plan_of(ivf),
        ["BroadcastNestedLoopJoin", "partial_max", "!CartesianProduct",
         "!ArrowEvalPython", "!BatchEvalPython"],
    ))

    # 6b. quality filters: one map pass, no Exchange, no Python anywhere
    from corpus_dedup_spark.operators.quality_filters import (
        c4_line_filter, gopher_quality_flags)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text")
    # higher-order lambdas are not codegen-able, so the pass is an
    # interpreted Project; the staged `_kept`/`_words` aliases assert the
    # arrays are materialized ONCE per row instead of re-evaluated per
    # consumer (CollapseProject inlines only cheap expressions)
    for name, fn, staged in (
            ("C4 line filter", c4_line_filter, "AS _kept"),
            ("Gopher quality flags", gopher_quality_flags, "AS _words")):
        sections.append((
            f"{name} (single map pass; lambda arrays staged once — "
            "no Exchange, no Python)",
            plan_of(fn(docs)),
            [staged, "!Exchange", "!ArrowEvalPython",
             "!BatchEvalPython", "!CartesianProduct"],
        ))

    # 6c. SemDeDup: broadcast centroids, partial-combining argmax cells,
    # intra-cell pair join only (no all-pairs), no Python
    from corpus_dedup_spark.operators.semantic_dedup import semantic_dedup

    emb2 = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding")
    sections.append((
        "SemDeDup semantic dedup (broadcast centroids; partial-combining "
        "argmax cells; intra-cell pairs only — no cartesian, no Python)",
        plan_of(semantic_dedup(emb2, threshold=0.8, n_centroids=8)),
        ["BroadcastNestedLoopJoin", "partial_max", "!CartesianProduct",
         "!ArrowEvalPython", "!BatchEvalPython"],
    ))

    # 6d. Bloom-prefiltered incremental dedup: definitely-new units reach
    # the union through a plain filter (no join on that branch); exactly one
    # left-anti join (the maybe branch); Python only in the Arrow probe
    from corpus_dedup_spark.operators.bloom_dedup import \
        bloom_incremental_dedup
    from corpus_dedup_spark.operators.exact_dedup import (dedup_units,
                                                          explode_units_arrow)

    bdocs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text")
    bcorpus = bdocs.filter("doc_id < 30")
    bcu = dedup_units(explode_units_arrow(bcorpus, id_col="doc_id"),
                      id_col="doc_id").select("norm_unit")
    _bk, bdd = bloom_incremental_dedup(bdocs.filter("doc_id >= 30"), bcu,
                                       n_items=4096, id_col="doc_id")
    bplan = plan_of(bdd)
    sections.append((
        "Bloom-prefiltered incremental dedup (broadcast-bitmap Arrow probe; "
        "definitely-new units bypass the anti-join; one LeftAnti for the "
        "maybe branch)",
        bplan,
        ["MapInArrow", "LeftAnti", "Union", "!CartesianProduct",
         "!BatchEvalPython"],
    ))
    # formatted explain names each join once in the tree and once in the
    # detail block — count the detail lines ("Join type: LeftAnti")
    n_anti = bplan.count("Join type: LeftAnti")
    if n_anti != 1:
        print(f"AUDIT FAILURE: expected exactly one LeftAnti join in bloom "
              f"plan, found {n_anti}")
        sys.exit(1)

    # 6e. Sequence packing: the global token offset must be a DISTRIBUTED
    # prefix sum — a range-partition Exchange and a per-partition window,
    # with the per-partition bases coming back via broadcast join. The
    # classic failure (sum() OVER (ORDER BY) with no PARTITION BY → a
    # SinglePartition exchange) is asserted ABSENT.
    from corpus_dedup_spark.operators.packing import pack_sequences

    sections.append((
        "Sequence packing (distributed prefix sum: range partition + "
        "per-partition window + broadcast bases — never SinglePartition)",
        plan_of(pack_sequences(docs, seq_len=256)),
        ["rangepartitioning", "BroadcastHashJoin", "!SinglePartition",
         "!ArrowEvalPython", "!BatchEvalPython", "!CartesianProduct"],
    ))

    # 6f. As-of join: union-tag sweep — ONE keyed window over the union,
    # no range/cross join anywhere
    from corpus_dedup_spark.operators.asof import asof_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    aj = asof_join(ev.select("event_id", "user_id", "ts"),
                   ev.filter("event_type = 'purchase'")
                     .select("user_id", "ts", "event_id", "value"),
                   key_col="user_id", ts_col="ts", left_id_col="event_id",
                   right_id_col="event_id", right_payload_cols=("value",))
    sections.append((
        "As-of join (union-tag sweep: one window keyed on user_id; "
        "no cross/range join, no Python)",
        plan_of(aj),
        ["Union", "hashpartitioning(user_id", "Window",
         "!CartesianProduct", "!BroadcastNestedLoopJoin",
         "!ArrowEvalPython", "!BatchEvalPython"],
    ))

    # 6g. Corpus-LM score: vocabulary agg partial-combines before its
    # exchange; the whole operator is JVM-side
    from corpus_dedup_spark.operators.lm_quality import unigram_lm_scores

    sections.append((
        "Unigram-LM quality score (vocab agg partial-combines; zero Python)",
        plan_of(unigram_lm_scores(docs)),
        ["partial_count", "!ArrowEvalPython", "!BatchEvalPython",
         "!CartesianProduct"],
    ))

    # 7. search line/col derivation: pure codegen expressions, no Python
    # (synthetic hits input so the plan isolates the derivation itself)
    from corpus_dedup_spark.operators.search import with_line_col

    hits_df = spark.createDataFrame([("1", 5)], ["url", "pos"])
    lc = with_line_col(hits_df, pages)
    sections.append((
        "Search hit line/col (JVM expressions only — no UDF)",
        plan_of(lc),
        ["split(", "length(", "!ArrowEvalPython", "!BatchEvalPython"],
    ))

    out = ["# PLANS — physical-plan audit (.explain formatted)", "",
           "Generated by scripts/explain_audit.py; assertions checked at generation "
           "time. Markers prefixed '!' assert ABSENCE.", ""]
    failures = []
    for title, plan, needles in sections:
        ok = all((n[1:] not in plan) if n.startswith("!") else (n in plan)
                 for n in needles)
        if not ok:
            missing = [n for n in needles
                       if ((n[1:] in plan) if n.startswith("!") else (n not in plan))]
            failures.append((title, missing))
        out += [f"## {title}", "",
                f"Checked markers: {needles} → {'OK' if ok else 'MISSING: ' + str(missing)}",
                "", "```", plan.strip(), "```", ""]
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    if failures:
        print("AUDIT FAILURES:")
        for t, m in failures:
            print(f"  {t}: missing {m}")
        sys.exit(1)
    print("plan audit OK → PLANS.md")


if __name__ == "__main__":
    main()
