"""Shared single-partition-window gate (VERDICT r9 #5).

A ``Window`` fed by ``Exchange SinglePartition`` serializes the whole
input through one task — the classic 100 TB scale-killer. The gate
allows it ONLY where the window provably runs on a bounded DOMAIN
(post-aggregate value domain, top-k prefix, or a locally-pruned
frontier), and requires the plan to show that bound (a HashAggregate
feeding the exchange) unless the query is in ``PRUNE_BOUNDED`` where
the bound is structural but invisible in plan text.

One constant, two consumers: ``tests/test_plans.py`` (graded-window
sweep, every pytest run) and ``tools/plan_audit.py --gate``
(full-registry sweep, wrap gate). Keeping the allowlist here means a
new offender fails BOTH gates until it is either rewritten or
allowlisted with written evidence below.
"""

from __future__ import annotations

# Every entry documents WHY its single-partition window is bounded:
#
# - stat_ks_test / stat_mannwhitney: cumulative window over the
#   DISTINCT-value domain (operators/stats.py — post-agg).
# - stat_psi: 5-row order-priority domain.
# - pipeline_release_v2 / sample_neyman / sample_budget_apportion:
#   Hamilton apportionment rank/total over the per-language / strata
#   mass table (|langs| rows, post-agg —
#   operators/sampling.py:largest_remainder_alloc).
# - eval_auc_exact / eval_auc_pr: cumulative window over the
#   distinct-score domain (operators/evals.py).
# - analytic_skyline: post-prune bucket frontier (each bucket forwards
#   only its local skyline — operators/skyline.py:skyline_2d).
# - stat_wilcoxon: cumulative window over the distinct-|diff| domain.
# - ts_theil_sen: REMOVED round 10 — rewritten onto a distributed
#   k-th selection (range-partition + per-partition counts + local
#   row_number inside the target partition); no single-partition
#   window remains in its plan.
# - ts_rolling_median / stat_runs_test / ts_cusum: windows over the
#   post-agg daily series (day domain).
# - eval_brier: bin-domain reliability terms; eval_conformal:
#   quantile-rank over the post-agg calibration-residual domain.
# Round-10 full-registry additions (VERDICT r9 #5 — the gate grew
# from the graded 50 to all plans; each of these was triaged against
# its source):
#
# - stat_gini / analytic_lorenz: sorted-rank formula COLLAPSED onto
#   the distinct-n_chars value domain; tie blocks contribute in closed
#   form, no row-level sort (operators/stats.py:gini_exact /
#   lorenz_points — lorenz additionally joins a 10-row band spine, so
#   the plan-text heuristic can't see its aggregate → PRUNE_BOUNDED).
# - stat_spearman: centered average ranks from the value domain
#   (operators/stats.py:spearman_rho).
# - ts_changepoint / ts_acf / ts_backtest_snaive: prefix/lag windows
#   over the per-DATE aggregate (day domain).
# - agg_weighted_percentile: cumulative weight over the
#   distinct-cents domain.
# - analytic_abc_classification: cumulative revenue over the part
#   CATALOG — a dimension, not the corpus; the docstring names the
#   two-phase grouped_running_sum swap-in for catalog scale.
# - analytic_growth_accounting: day-domain lag after the per-day
#   hash aggregate (the user-level window IS partitioned by user).
# - quality_skew_audit / sample_domain_mixture / stat_tvd_drift /
#   pipeline_drift_gate / pipeline_dataset_card /
#   sample_budget_apportion: rank/share windows over group / language
#   / bucket domains (one hash aggregate feeds every window;
#   largest_remainder_alloc is the Hamilton shape already allowed for
#   release_v2/neyman).
SINGLE_PARTITION_WINDOW_ALLOWED: frozenset[str] = frozenset(
    {
        "stat_ks_test",
        "stat_psi",
        "pipeline_release_v2",
        "eval_auc_exact",
        "analytic_skyline",
        "stat_wilcoxon",
        "ts_rolling_median",
        "stat_mannwhitney",
        "stat_runs_test",
        "ts_cusum",
        "eval_auc_pr",
        "eval_brier",
        "eval_conformal",
        "sample_neyman",
        # round-10 full-registry triage (see block comment above)
        "stat_gini",
        "analytic_lorenz",
        "stat_spearman",
        "ts_changepoint",
        "ts_acf",
        "ts_backtest_snaive",
        "agg_weighted_percentile",
        "analytic_abc_classification",
        "analytic_growth_accounting",
        "quality_skew_audit",
        "sample_domain_mixture",
        "stat_tvd_drift",
        "pipeline_drift_gate",
        "pipeline_dataset_card",
        "sample_budget_apportion",
    }
)

# Bounded by construction, but the bound is a local-prune filter or a
# domain-squared join that the "HashAggregate feeds the exchange"
# heuristic cannot see in plan text.
PRUNE_BOUNDED: frozenset[str] = frozenset(
    {"analytic_skyline", "analytic_lorenz"}
)


def flag_single_partition_windows(plan: str) -> tuple[bool, bool]:
    """Scan an executedPlan().toString() tree.

    Returns ``(has_single_partition_window, all_post_agg)`` where
    ``all_post_agg`` is True when every flagged window's exchange is
    fed by a hash aggregate within the next few plan lines (the
    domain-bound evidence).
    """
    lines = plan.split("\n")
    found = False
    all_post_agg = True
    for i, ln in enumerate(lines):
        if "Window " not in ln:
            continue
        tail = lines[i + 1 : i + 5]
        if not any("Exchange SinglePartition" in t for t in tail):
            continue
        found = True
        post_agg = any("HashAggregate" in t for t in lines[i + 1 : i + 8])
        all_post_agg = all_post_agg and post_agg
    return found, all_post_agg
