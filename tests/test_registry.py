"""Registry ordering contract.

The driver's correctness gate evaluates the first 50 entries of
``queries()`` in iteration order, so the ordering is load-bearing.
``plans._PRIORITY`` pins the window; these tests keep it honest.

Round-8 shape: the window BEGINS with the full 25-name never-official
backlog (20 names pledged by the r6/r7 rotation comments + round-7's
five registrations), and every NEW round-8 registration must land
inside the remaining free slots — the no-new-debt invariant below is
the machine-checked form of the rotation comment's promise that a
query never sits mirror-green without an official row for multiple
rounds again.
"""

import glob
import json
import re

from celestrak_tle_data_pipeline_spark import plans
from celestrak_tle_data_pipeline_spark.plans import _PRIORITY

BACKLOG_25 = (
    "sql_lateral_topn_per_segment",
    "debounce_first_per_burst",
    "session_entry_exit_matrix",
    "tle_j2_secular_rates",
    "tle_theil_sen_decay",
    "fd_violation_profile",
    "neyman_allocation_sources",
    "l_diversity_audit",
    "join_size_sample_estimate",
    "kaplan_meier_sessions",
    "scd2_asof_lookup",
    "cumulative_distinct_users",
    "seasonal_naive_mase",
    "association_rules_parts",
    "time_to_convert_quartiles",
    "attribution_linear_touch",
    "discount_quantity_elasticity",
    "holt_linear_forecast",
    "open_order_backlog_sweep",
    "shipping_sla_attainment",
    "pareto_decile_ranged",
    "cdc_warehouse_roundtrip",
    "document_chunks_overlap",
    "streaming_sessions_finalized",
    "streaming_trailing_median",
)


def test_priority_heads_the_registry_within_the_50_window():
    names = list(plans.all_queries().keys())
    assert len(_PRIORITY) <= 50
    assert names[: len(_PRIORITY)] == list(_PRIORITY)


def test_priority_names_unique_and_registered():
    assert len(set(_PRIORITY)) == len(_PRIORITY)
    registered = plans.all_queries()
    assert all(n in registered for n in _PRIORITY)


def test_r8_window_closed_the_backlog():
    # Historical invariant (was the live round-8 window pin): the 25
    # never-official backlog names headed the r8 window and all went
    # officially green there. Checked against the recorded gate output
    # rather than today's _PRIORITY, which rotates every round.
    r8 = set(json.load(open("CORRECTNESS_r08.json")))
    assert set(BACKLOG_25) <= r8


def test_r9_window_flipped_the_bank():
    # Historical invariant for the round-9 rotation: the staged bank
    # (plans/next_window.py) flipped live and every bank name has an
    # official green row in CORRECTNESS_r09.json.
    from celestrak_tle_data_pipeline_spark.plans import next_window

    r9 = set(json.load(open("CORRECTNESS_r09.json")))
    assert set(next_window.NEXT_QUERIES) <= r9


def _official_green_before(window_round: int) -> set[str]:
    """Names with a GREEN official record before ``window_round``.

    Green = hash-matched against the oracle, or a rows-only record for
    a by-design no-oracle name (err == "no_oracle"). A hash-FAILED
    official record does NOT retire a name — re-greening it is exactly
    what a window slot is for (r11 verdict item 1:
    ``kendalls_w_concordance`` hash-failed r11 on an oracle dtype and
    re-windows in r12). Rounds >= window_round are excluded (r10
    era-proofing): once the driver writes this round's own file the
    window names are official by construction. Non-canonical filenames
    (e.g. a stray CORRECTNESS_r11_backup.json) are skipped, not fatal.
    """
    official: set[str] = set()
    for f in glob.glob("CORRECTNESS_r*.json"):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", f)
        if not m or int(m.group(1)) >= window_round:
            continue
        for name, rec in json.load(open(f)).items():
            if rec.get("hash_match") or rec.get("err") == "no_oracle":
                official.add(name)
    return official


def test_window_is_all_first_time_names():
    # Rotation invariant: the previous window is green, so every slot
    # turns over to work never officially GREEN before — no recycled
    # re-greens padding the window, while a hash-failed name stays
    # eligible for the re-green slot it needs.
    official = _official_green_before(plans.WINDOW_ROUND)
    recycled = [n for n in _PRIORITY if n in official]
    assert not recycled, f"recycled already-official names: {recycled}"


def test_no_new_official_debt():
    # Every oracle-paired registry name is either already officially
    # green (appears in some CORRECTNESS_r*.json) or inside this
    # round's 50-slot window. A name failing this check would be
    # registered-but-never-officially-checked — the debt class rounds
    # 5-7 spent three rotation windows paying down.
    official: set[str] = set()
    for f in glob.glob("CORRECTNESS_r*.json"):
        official |= set(json.load(open(f)))
    oracles = set(plans.all_oracles())
    debt = oracles - official - set(_PRIORITY)
    assert not debt, f"oracle-paired but never-official and unwindowed: {sorted(debt)}"


def test_first_50_oracle_coverage():
    # Every priority query is value-checked against DuckDB EXCEPT the
    # two documented rows-only names (plans.ROWS_ONLY — no SQL oracle
    # by design; the r10 verdict directed them into the window tail so
    # the official record shows their rows-only status explicitly).
    oracles = plans.all_oracles()
    missing = [
        n for n in _PRIORITY if n not in oracles and n not in plans.ROWS_ONLY
    ]
    assert not missing, f"priority names without oracles: {missing}"
    assert all(n not in oracles for n in plans.ROWS_ONLY)


def test_priority_outputs_are_scalar(spark):
    # Driver-canonicalizer contract (see plans/__init__.py docstring):
    # the driver sorts result cells with pandas, which cannot order
    # list/dict cells — a single array-typed output column makes an
    # otherwise-correct query officially RED (round 3's
    # multimodal_feature_extract). Build every priority query's plan
    # and reject nested types in its result schema.
    from conftest import scalar_output_violations

    qs = plans.all_queries()
    bad = scalar_output_violations(
        spark, {name: qs[name] for name in _PRIORITY}
    )
    assert not bad, f"non-scalar output columns in priority window: {bad}"
