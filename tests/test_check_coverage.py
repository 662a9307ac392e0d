"""The rotation-staleness checker: a 50-slot gate window over a ~100
query registry must mechanically force every oracle query back into
the window before it goes more than MAX_STALE_ROUNDS rounds without a
driver-green row."""

from __future__ import annotations

from tools.check_coverage import MAX_STALE_ROUNDS, load_history, stale_queries


def test_stale_registry_is_flagged():
    oracles = {"a", "b", "c", "never"}
    history = {1: {"a", "b", "c"}, 2: {"a"}, 3: {"a"}, 4: {"a"}}
    # b last green r1 -> 4 rounds stale after r5; c in window -> fine
    bad = stale_queries(oracles, window={"a", "c"}, history=history)
    assert len(bad) == 2
    assert any(s.startswith("b ") for s in bad)
    assert any(s.startswith("never ") for s in bad)


def test_exactly_at_bound_passes():
    oracles = {"a", "b"}
    history = {2: {"b"}, 3: {"a"}, 4: {"a"}}
    # b last green r2, in no window until now; next round is 5 ->
    # 3 rounds stale -> must be flagged ...
    assert stale_queries(oracles, window=set(), history=history)
    # ... but putting it in the window clears it
    assert stale_queries(oracles, window={"b"}, history=history) == []
    # and a query green MAX_STALE_ROUNDS ago exactly is NOT stale yet
    history = {3: {"b"}, 4: {"a"}}
    assert stale_queries({"a", "b"}, window=set(), history=history) == []


def test_no_history_requires_everything_in_window():
    assert stale_queries({"x"}, window=set(), history={}) == ["x"]
    assert stale_queries({"x"}, window={"x"}, history={}) == []


def test_current_repo_window_holds_the_bound():
    """The real registry + real CORRECTNESS history must pass — this is
    the same check tools/check_coverage.py runs per-round.

    DESIGNED TRIPWIRE (one of a TWIN, with
    test_next_round_plan_matches_the_live_registry): both go red
    together when a new CORRECTNESS_r*.json lands and the window has
    not been rotated yet — "2 failed" at round start is the alarm
    firing as designed, not a regression. Rotating GATE_WINDOW per
    `python tools/check_coverage.py --plan` clears both."""
    import __spark_entry__ as entry

    oracles = set(entry.oracle_sql())
    window = set(list(entry.queries())[:50])
    assert stale_queries(oracles, window, load_history()) == []
    # sanity on the parser: r4 recorded 50 green rows
    hist = load_history()
    assert len(hist[4]) == 50
    assert MAX_STALE_ROUNDS == 2


def test_next_round_plan_projects_the_window_forward():
    from tools.check_coverage import next_round_plan

    oracles = {"cdc_a", "dedup_b", "text_c", "pii_d"}
    history = {1: {"cdc_a", "dedup_b"}, 2: {"text_c"}, 3: {"pii_d"}}
    # this round is r4: cdc_a/dedup_b (last r1, 3 rounds stale) must be
    # in THIS round's window; with {text_c} greening at r4, nothing
    # else hits the bound at r5 (pii_d r3 is exactly at it).
    due_now, due_next, floors = next_round_plan(
        oracles, window={"text_c"}, history=history
    )
    assert due_now == ["cdc_a", "dedup_b"]
    assert due_next == []
    # floor hits name which debt queries can hold each family
    assert floors["cdc merge algebra"] == ["cdc_a"]
    assert floors["dedup"] == ["dedup_b"]
    assert floors["privacy"] == []  # pii_d is not in the debt -> gap
    # a never-green oracle out of window is due NOW (must debut
    # in-window), and a query aging to the bound lands in due_next
    due_now2, due_next2, _ = next_round_plan(
        oracles | {"text_new"}, window=set(), history=history
    )
    assert "text_new" in due_now2
    assert "text_c" in due_next2  # r2-green, bound-stale at r5
    # the two horizons never overlap
    assert not set(due_now2) & set(due_next2)


def test_next_round_plan_matches_the_live_registry():
    """The --plan output for the CURRENT repo must agree with the
    staleness checker: making next round's window = (its mandatory
    list + anything) clears the bound.

    DESIGNED TRIPWIRE TWIN of test_current_repo_window_holds_the_bound:
    the two redden TOGETHER when a new CORRECTNESS_r*.json lands before
    the window rotates (this one's `due_now == []` assertion prints the
    next round's mandatory rotation list). Seeing exactly these two
    fail at round start is the designed alarm, not a regression."""
    import __spark_entry__ as entry

    from tools.check_coverage import next_round_plan, stale_queries

    oracles = set(entry.oracle_sql())
    window = set(list(entry.queries())[:50])
    history = load_history()
    due_now, due_next, _ = next_round_plan(oracles, window, history)
    # a rotated window has no same-round debt left
    assert due_now == []
    # simulate this round landing: every in-window oracle greens —
    # then a next window of exactly the due-next pool clears the bound
    nxt = max(history) + 1
    simulated = dict(history)
    simulated[nxt] = window & oracles
    assert stale_queries(oracles, set(due_next), simulated) == []


def test_adjudicate_baseline_pick_is_sf_aware(tmp_path):
    """tools/adjudicate.py must never compare across scale factors —
    the same sf-aware rule bench.py uses."""
    import json

    from tools.adjudicate import _pick_baseline

    (tmp_path / "BENCH_r07.json").write_text(json.dumps({"sf": 0.1, "queries": {}}))
    (tmp_path / "BENCH_r08.json").write_text(json.dumps({"sf": 0.1, "queries": {}}))
    (tmp_path / "BENCH_r08_sf1.json").write_text(
        json.dumps({"parsed": {"sf": 1.0, "queries": {}}})
    )
    (tmp_path / "not_a_bench.json").write_text("{}")
    assert _pick_baseline(str(tmp_path), 0.1) == "BENCH_r08.json"
    assert _pick_baseline(str(tmp_path), 1.0) == "BENCH_r08_sf1.json"
    assert _pick_baseline(str(tmp_path), 3.0) is None
    # newest = highest PARSED round number, not lexicographic filename
    # order (ADVICE r9: BENCH_r9.json sorts after BENCH_r10.json)
    (tmp_path / "BENCH_r9.json").write_text(json.dumps({"sf": 0.1, "queries": {}}))
    (tmp_path / "BENCH_r10.json").write_text(json.dumps({"sf": 0.1, "queries": {}}))
    assert _pick_baseline(str(tmp_path), 0.1) == "BENCH_r10.json"


def test_bench_flag_rule_needs_both_readings_slower():
    """bench.py's REGRESSED/CREEP gate: calibrated >= 1.3x AND raw >=
    1.05x, delta tiers 1.0s / 0.10s — every historical true creep
    still fires, every calibration-manufactured one does not."""
    from bench import flag_for

    # r7's real creep class: 1.37x raw on a same-speed host
    assert flag_for(1.507, 1.101, 1.0) == "CREEP"
    # r8's cdc_snapshot_merge (+0.137s, 1.39x) — the 0.10s floor case
    assert flag_for(0.486, 0.280, 1.25) == "CREEP"
    # a real >=1s regression
    assert flag_for(5.0, 2.0, 1.0) == "REGRESSED"
    # r9's false positives: RAW-faster on a fast-calib host (baseline
    # scaled by 0.62x) must never flag
    assert flag_for(1.889, 2.004, 0.62) is None
    # slow host absolves a raw slowdown (the r6 case: 2x slower VM)
    assert flag_for(2.2, 1.1, 2.0) is None
    # calibrated-slower but raw within 5% -> no flag
    assert flag_for(1.04, 1.0, 0.62) is None
    # tiny calibrated delta (< 0.10s) stays silent even at high ratio
    assert flag_for(0.15, 0.1, 1.0) is None


def test_every_prepared_oracle_is_live_or_staged_discoverable():
    """Every module-level ORACLE_* constant in workloads.llmdata must
    be either (a) registered in the live ``oracle_sql()`` surface or
    (b) named exactly ORACLE_<QUERY> for a registered query — the
    contract tools/check_staged.py's auto-discovery relies on.  A
    prepared oracle that matches neither (a renamed query, a typo'd
    constant) would silently drop out of the per-round 3-sf staging
    certification; this makes that loud."""
    import __spark_entry__ as entrymod
    from spark_cdc_replication_spark.workloads import llmdata

    live_sql = set(entrymod.oracle_sql().values())
    registered = set(entrymod.queries())
    orphans = []
    for const in dir(llmdata):
        if not const.startswith("ORACLE_"):
            continue
        sql = getattr(llmdata, const)
        if not isinstance(sql, str):
            continue
        name = const[len("ORACLE_"):].lower()
        if sql not in live_sql and name not in registered:
            orphans.append(const)
    assert not orphans, (
        f"prepared oracles invisible to both the driver gate and "
        f"check_staged discovery: {orphans}"
    )

    # and the discovery itself currently sees the documented queue
    import sys

    sys.path.insert(0, "tools")
    from check_staged import staged_pairs

    staged = set(staged_pairs())
    assert staged == {
        "dedup_corpus_keep_best",
        "pii_tcloseness",
        "text_line_dedup_doc",
        "text_excise_spans_fixpoint",
    }, f"staged queue drifted: {sorted(staged)} — update this pin on debut"


def test_plandiff_normalize_collapses_only_spark_truncation_tails():
    """The r15 ADVICE fix, pinned: Spark's end-of-line truncation
    idiom ('...' optionally followed by ', N more fields') collapses
    so differing cut points can't read as plan diffs — but a MID-line
    token containing '...' is a real difference and must survive."""
    import sys

    sys.path.insert(0, "tools")
    from plandiff import normalize

    # differing truncation cut points normalize identically
    a = "Scan parquet [a#1L, b#2L, veryLongFi... 3 more fields]"
    b = "Scan parquet [a#10L, b#22L, veryLongFiel... 3 more fields]"
    assert normalize(a) == normalize(b)
    # trailing bare '...' also collapses
    assert normalize("Filter (x#1L > someLongLit...") == normalize(
        "Filter (x#12L > someLongLitera..."
    )
    # a mid-line token difference containing '...' SURVIVES
    c = normalize("Project [slice(arr#1L, 1...5) AS s#2L, tail#3L]")
    d = normalize("Project [slice(arr#1L, 2...9) AS s#2L, tail#3L]")
    assert c != d
    # the r16 ADVICE case: a truncated FIRST list on a multi-list line
    # (cut sits immediately before the closing bracket) collapses, so
    # differing id widths in the truncated region can't read as a diff
    e = "Arguments: [a#1L, b#2L, veryLon..., 22 more fields], [x#3L, y#4L]"
    f = "Arguments: [a#11L, b#222L, very..., 22 more fields], [x#33L, y#44L]"
    assert normalize(e) == normalize(f)
    # ... while the SECOND (untruncated) list still participates: a
    # real difference there survives the collapse
    g = "Arguments: [a#1L, veryLon..., 2 more fields], [x#3L + 1]"
    h = "Arguments: [a#1L, veryLon..., 2 more fields], [x#3L + 2]"
    assert normalize(g) != normalize(h)
