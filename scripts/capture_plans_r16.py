"""Capture before/after .explain('formatted') for every query the r16
optimization round touched, into plans/r16/<head>_{before,after}.txt.

'Before' plans are reconstructed from the SAME code via the explicit
escape hatches the round added (impl='expr' for the Arrow scorers; a
widen_scan identity patch for the skew heads), so the pair diffs
exactly the optimization and nothing else.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r16")


def _write(name: str, which: str, df) -> None:
    os.makedirs(OUT, exist_ok=True)
    p = os.path.join(OUT, f"{name}_{which}.txt")
    with open(p, "w") as f:
        f.write(df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"))
    print("wrote", p)


def main() -> None:
    from sensorstream_scalable_sensor_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="plans-r16", master="local[4]",
                      shuffle_partitions=32)
    sf = bench.SF_DIR

    from sensorstream_scalable_sensor_data_pipeline_spark.sources.tables import (
        load_table,
    )

    load_table(spark, sf, "region").count()

    # --- IVF serve heads: arrow (after) vs expr (before) -----------
    import sensorstream_scalable_sensor_data_pipeline_spark.plans.ann_serving as ann
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.ann_index import (
        query_ivf_index,
    )
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.pq import (
        query_ivfpq_index,
    )

    ann.ivf_serve_large_setup(spark, sf)
    ann.ivf_serve_large_sq8_setup(spark, sf)
    ann.ivf_serve_large_pq_setup(spark, sf)
    q = ann._large_queries(spark)
    for head, idx, fn, kw in (
        ("ivf_serve_large", ann._index_dir_large, query_ivf_index, {}),
        ("ivf_serve_large_sq8", ann._index_dir_large_sq8, query_ivf_index, {}),
        ("ivf_serve_large_pq", ann._index_dir_large_pq, query_ivfpq_index, {}),
    ):
        for which, impl in (("before", "expr"), ("after", "arrow")):
            df = fn(spark, idx, q, k=5, nprobe=ann._LARGE_NPROBE,
                    impl=impl, **kw)
            _write(head, which, df)

    # --- skew heads: widened (after) vs identity widen (before) ----
    import sensorstream_scalable_sensor_data_pipeline_spark.plans.temporal as tmp
    from sensorstream_scalable_sensor_data_pipeline_spark.sources.tables import (
        widen_scan,
    )

    for which in ("before", "after"):
        tmp.widen_scan = (lambda df, min_parts=None: df) if which == "before" else widen_scan
        _write("asof_join_skewed", which, tmp.asof_join_skewed_head(spark, sf))
        _write("asof_join_skewed_bucketed", which,
               tmp.asof_join_skewed_bucketed_head(spark, sf))
    tmp.widen_scan = widen_scan

    # --- decode-path heads (decontaminate_video, dedup_phash) ------
    # The r16 change here is PER-TASK work (guide §4.2: faster JPEG
    # entropy decode + frame-step sampling inside the mapInPandas
    # functions) — the physical plan is deliberately unchanged, and
    # identical before/after files are the evidence for that claim.
    # The MapInPandas/ArrowEvalPython nodes are where the win lives.
    import sensorstream_scalable_sensor_data_pipeline_spark.plans.multimodal as mm
    from pyspark.sql import functions as F
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.video_dedup import (
        decontaminate_videos,
    )

    mm.decontaminate_video_head_setup(spark, sf)
    mm.dedup_phash_head_setup(spark, sf)
    for which in ("before", "after"):
        # the head itself wraps the pipeline in an eager closed-form
        # assertion (its returned frame is a 1-row local relation), so
        # capture the UNasserted pipeline the head times: the survivor
        # aggregate over decontaminate_videos
        corpus = mm._read_corpus(spark, sf, "video", mm._video_corpus)
        ev = mm._read_corpus(spark, sf, "video_eval", mm._video_eval_corpus)
        clean = decontaminate_videos(corpus, ev, "doc_id", "payload", every_n=2)
        _write(
            "decontaminate_video", which,
            clean.agg(
                F.count(F.lit(1)).alias("n_kept"),
                F.sum("doc_id").alias("id_sum"),
                F.sum(F.length("payload")).alias("bytes_kept"),
            ),
        )
        _write("dedup_phash", which, mm.dedup_phash_head(spark, sf))

    spark.stop()


if __name__ == "__main__":
    main()
