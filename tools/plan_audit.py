"""Regenerate PLANS.md: formatted physical plans of the headline queries
with the scale-relevant features called out. Run from the repo root:

    python tools/plan_audit.py

The narrative claims in docstrings ("broadcast", "pushed filters", "no
corpus shuffle") are enforced by tests/test_plans.py; this file makes the
actual plans legible without running anything.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AUDITED = {
    "q1_pricing_summary": "pushed filters + partial agg before the exchange",
    "language_profile": "broadcast profile join; partial agg per (doc, lang) before one exchange",
    "audio_metadata_neardup": "metadata-key-blocked self-join (broadcast at fixture size, SMJ on blocks at scale)",
    "q5_local_supplier_volume": "dimension joins broadcast; one fact shuffle",
    "topk_per_group": "TakeOrderedAndProject (no global sort)",
    "dedup_minhash_lsh": "id/hash-only exchanges; text never shuffles",
    "dedup_repeated_chunks": "partial_min winner election; LeftSemi reassembly",
    "ivf_pq_topk": "broadcast codebook, literal ADC table, narrow corpus scan",
    "flf_parse_expression": "single narrow stage, no Python eval",
    "bigram_pmi_collocations": "one documents scan; all aggregates reuse one exchange",
    "ivf_pq_topk_partitioned": "PartitionFilters prune non-probed cells at the scan",
    "skyline_pareto_parts": "range exchange + boundary-carry windows; no quadratic join",
    "weighted_sample_docs": "A-ES priority top-k as TakeOrderedAndProject, all JVM-side",
    "inverted_index_postings": "rn<=50 cap filters under the window before collect_list",
    "winnow_fingerprints": "single PRE-explode exchange; gram stream never shuffles",
    "event_value_outliers": "broadcast group stats; TakeOrderedAndProject top-50",
    "referential_orphans_audit": "four LeftAnti joins on distinct dim keys",
    "winsorize_event_values": "rank window + broadcast cutoffs + narrow clamp",
    "theil_sen_trend_revenue": "equi-bucketed banded pair join (hash join, no nested loop)",
    "benford_digit_test": "one scan; 9-row spine join + 1-row total broadcast",
    "lagged_crosscorr_orders": "post-agg daily self-join on shifted dates",
    "delta_id_mode_read": "field-id-resolved parquet scan (SPARK-38094); no Python, no join",
    "delta_nested_struct_mapping_read": "recursively-physical scan + positional struct-cast projection",
    "iceberg_partition_evolution": "per-spec-epoch plain scans unioned; pruning is driver-side metadata",
    "delta_foreign_features_read": "v2-checkpoint/sidecar folding is driver-side; data plan = plain scans + agg",
    "delta_invariants_enforced": "invariant validation is commit-time; read plan untouched (scan + agg)",
    "iceberg_v3_dv_read": "Puffin DVs decode driver-side; (file,pos) broadcast LeftAnti masks the scan",
    "delta_source_nested_mapping_read": "per-file nested rename inside the Python source; broadcast equi-join after",
    "iceberg_v3_append": "row-lineage assignment is driver-side; DV masking via broadcast LeftAnti",
    "delta_generated_columns_enforced": "generation-expression validation is commit-time; read plan = scan + agg",
    "delta_identity_columns": "zero-shuffle id generation at commit; read plan = scan + agg",
    "delta_type_widening_read": "mixed int32/int64 files decode in one plain scan (native parquet widening)",
    "delta_in_commit_timestamps": "ICT stamping is one metadata JSON read per publish; read plan = scan + DV anti-join + agg",
    "delta_row_tracking_append": "baseRowId assignment is driver-side stat arithmetic; read plan = scan + agg",
    "delta_variant_read": "variant decode is native in the scan; DV broadcast anti-join; no Python",
    "delta_multipart_checkpoint_read": "multi-part checkpoint folding is driver-side; data plan = plain scans + agg",
    "iceberg_v3_compaction_lifecycle": "lineage-preserving compaction; post-rewrite read = plain scan + agg, DVs gone",
    "delta_row_tracking_optimize": "materialized-id OPTIMIZE; post-rewrite read = plain scan + agg, DVs gone",
    "iceberg_v3_default_values": "initial-defaults fill at the projection (literal coalesce); plain scan + agg",
    "multimodal_arith_jpeg_features": "partition-local mapInPandas; image bytes never shuffle",
    "multimodal_lossless_jpeg_features": "partition-local mapInPandas; image bytes never shuffle",
    "multimodal_hier_jpeg_features": "partition-local mapInPandas; image bytes never shuffle",
    "multimodal_flac_features": "partition-local mapInPandas; audio bytes never shuffle",
    "multimodal_gif_frames": "partition-local mapInPandas; media bytes never shuffle",
    "multimodal_tiff_features": "partition-local mapInPandas; image bytes never shuffle",
    "multimodal_cross_format_neardup": "partition-local hashing; 16-bit band self-join, no all-pairs",
}


def main() -> None:
    from evolution_spark.queries import QUERIES
    from evolution_spark.session import get_spark

    spark = get_spark(master="local[8]")
    sf_dir = "/root/testdata/sf0.001"
    out = [
        "# PLANS — audited physical plans (regenerate: `python tools/plan_audit.py`)",
        "",
        "Formatted `explain` output at sf0.001 (plan shape is scale-invariant;",
        "AQE may further coalesce at runtime). The properties named per query",
        "are asserted in `tests/test_plans.py`.",
        "",
    ]
    for name, why in AUDITED.items():
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # strip volatile ids/paths so regeneration diffs stay reviewable
        plan = re.sub(r"#\d+L?", "#_", plan)
        plan = re.sub(r"\[plan_id=\d+\]", "[plan_id=_]", plan)
        plan = re.sub(r"file:[^\s,\]]+", "file:...", plan)
        out += [f"## {name}", "", f"*{why}*", "", "```", plan.rstrip(), "```", ""]
    with open(os.path.join(os.path.dirname(__file__), "..", "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(AUDITED)} plans)")


if __name__ == "__main__":
    main()
