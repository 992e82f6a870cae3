"""Documentation count hygiene: README's query/oracle/rows-only claims
must equal the live registry. Hand-typed counts went stale twice (README
in r4, CHANGES_r05 in r5) — this test ends the class by asserting every
numeric claim against `collect_registry()` itself. No Spark session
needed; the registry is plain dicts."""
import json
import os
import re

from big_data_science_project_spark.operators import collect_registry

README = "/root/repo/README.md"


def _counts():
    queries, oracles = collect_registry()
    return len(queries), len(oracles), len(queries) - len(oracles)


def test_readme_counts_match_registry():
    n_q, n_o, n_rows_only = _counts()
    text = open(README).read()
    # collapse wrapped lines so phrases split across a line break match
    flat = re.sub(r"\s+", " ", text)

    m = re.search(r"(\d+) named queries", flat)
    assert m, "README no longer states the named-query count"
    assert int(m.group(1)) == n_q, (
        f"README claims {m.group(1)} queries, registry has {n_q}")

    m = re.search(r"(\d+) queries carry oracles", flat)
    assert m, "README no longer states the oracle count"
    assert int(m.group(1)) == n_o, (
        f"README claims {m.group(1)} oracles, registry has {n_o}")

    m = re.search(r"The (\d+) rows-only queries", flat)
    assert m, "README no longer states the rows-only count"
    assert int(m.group(1)) == n_rows_only, (
        f"README claims {m.group(1)} rows-only, registry has {n_rows_only}")

    # The "N oracle matches" sentence cites FROZEN selfcheck artifacts, so
    # it must match what those files actually record — asserting it
    # against the live registry (the r6 version of this test) is what made
    # the sentence silently misstate the artifact when oracles were added
    # without a regen. Artifact freshness is a separate test below.
    arts = _selfcheck_artifacts(text)
    cites = re.findall(r"(\d+) oracle matches, 0 failures", flat)
    # the citation sentence must EXIST — an empty findall would make
    # this gate vacuous under any rewording (the r4 silent-staleness
    # class this test ends)
    assert cites, ("README no longer contains the "
                   "'N oracle matches, 0 failures' selfcheck citation")
    for n in cites:
        for path, summary in arts.items():
            assert int(n) == summary["match"], (
                f"README cites {n} oracle matches but {path} records "
                f"{summary['match']}")
            assert summary["fail"] == 0, (
                f"README claims 0 failures but {path} records "
                f"{summary['fail']}")


def _selfcheck_artifacts(readme_text):
    """The three SELFCHECK files the README cites, loaded."""
    m = re.search(r"`(SELFCHECK_r\d+)\.json` / `(_\w+)` / `(_\w+)`",
                  readme_text)
    assert m, "README no longer cites the selfcheck artifact trio"
    base = m.group(1)
    paths = [f"{base}.json", f"{base}{m.group(2)}.json",
             f"{base}{m.group(3)}.json"]
    out = {}
    for p in paths:
        full = os.path.join(os.path.dirname(README), p)
        assert os.path.exists(full), f"README cites missing artifact {p}"
        with open(full) as f:
            out[p] = json.load(f)["summary"]
    return out


def test_selfcheck_artifacts_cover_live_registry():
    """Freshness gate, separated from the sentence gate above: the cited
    artifacts must have been generated for the CURRENT registry. When a
    query or oracle is added, this is the test that demands a
    `tools/selfcheck.py` regen (instead of corrupting the README's
    citation of the frozen files)."""
    n_q, n_o, n_rows_only = _counts()
    for path, s in _selfcheck_artifacts(open(README).read()).items():
        assert s["total"] == n_q, (
            f"{path} covers {s['total']} queries, registry has {n_q} — "
            "regenerate the selfcheck trio (tools/selfcheck.py)")
        assert s["match"] + s["fail"] == n_o, (
            f"{path} checked {s['match'] + s['fail']} oracles, registry "
            f"has {n_o} — regenerate the selfcheck trio")
        assert s["rows_only"] == n_rows_only, path


def test_oracles_are_subset_of_queries():
    queries, oracles = collect_registry()
    extra = set(oracles) - set(queries)
    assert not extra, f"oracles without a query: {sorted(extra)}"


def test_multimodal_scale_artifact_matches_probe_schema():
    """Probe-to-artifact consistency pin (r11 verdict item 1): in r11
    the probe gained two tiers and a 100x rung but the committed
    MULTIMODAL_SCALE.json kept the old 4-tier, 10x-only schema — a
    committed claim with no committed evidence. This test makes that
    class impossible: the artifact's tier set and rung keys must match
    the probe's own TIERS/DEFAULT_REPS tables, so upgrading the probe
    without regenerating its artifact fails CI."""
    sys_path = os.path.join(os.path.dirname(README), "tools")
    import sys
    sys.path.insert(0, sys_path)
    try:
        from multimodal_scale_probe import DEFAULT_REPS, TIERS
    finally:
        sys.path.remove(sys_path)

    art_path = os.path.join(os.path.dirname(README),
                            "MULTIMODAL_SCALE.json")
    with open(art_path) as f:
        art = json.load(f)

    assert art.get("reps") == list(DEFAULT_REPS), (
        f"artifact reps {art.get('reps')} != probe DEFAULT_REPS "
        f"{list(DEFAULT_REPS)} — rerun tools/multimodal_scale_probe.py")
    expect_tiers = {name for name, _ in TIERS}
    assert set(art.get("tiers", {})) == expect_tiers, (
        f"artifact tiers {sorted(art.get('tiers', {}))} != probe tiers "
        f"{sorted(expect_tiers)} — rerun tools/multimodal_scale_probe.py")
    rungs = ["base"] + [f"x{r}" for r in DEFAULT_REPS]
    for name, entry in art["tiers"].items():
        for rung in rungs:
            assert rung in entry, (f"{name} missing rung {rung} — rerun "
                                   "the probe with its default reps")
            # the artifact's standing claim: zero false pairs at every
            # rung that reports the pair-verdict shape
            if "false_pairs" in entry[rung]:
                assert entry[rung]["false_pairs"] == 0, (name, rung)
            # gate rungs must demonstrate PRECISION on genuinely novel
            # content too (r12 verdict item 2; pin strengthened to
            # EXACT counts in r14 after the image family got its own
            # salted generator): every rung of every batch-vs-index
            # gate must admit ALL of its fresh plants — the old
            # `> 0` pin let the image gate's admitted decay 4→3→2
            # across rungs without failing until it hit zero
            if "tiers" in entry[rung]:
                from big_data_science_project_spark.operators import \
                    multimodal as MM
                planted_fresh = {
                    "ingest_gate_index": MM.INGEST_IMG_FRESH,
                    "audio_gate_index": len(MM.AUDIO_GATE_FRESH),
                    "video_gate_index": len(MM.VIDEO_GATE_FRESH),
                }[name]
                assert (entry[rung]["tiers"].get("admitted", 0)
                        == planted_fresh), (
                    f"{name} {rung}: admitted "
                    f"{entry[rung]['tiers'].get('admitted', 0)} != "
                    f"planted {planted_fresh} — a fresh plant "
                    "collided with the scaled index")


def test_driver_window_policy_invariants():
    """The steady-state driver-window policy (r13 verdict item 2) is
    COMPUTED, not hand-rotated — pin its invariants so it can neither
    ossify nor skip a changed module: (a) the canaries lead; (b) every
    value oracle implemented in a TOUCHED_MODULES module sits inside
    the driver's 50-slot window; (c) the refill section is ordered
    least-recently-verified first; (d) the generated history table
    only names registry oracles (a rename would silently reset a
    query's age)."""
    from big_data_science_project_spark.operators import (
        CANARIES, TOUCHED_MODULES, TOUCHED_QUERIES, WINDOW_SIZE)
    from big_data_science_project_spark.operators._window_history import \
        LAST_VERIFIED

    queries, oracles = collect_registry()
    window = list(queries)[:WINDOW_SIZE]
    assert window[:len(CANARIES)] == list(CANARIES)

    # (b) touched-module oracles are mandatory window members
    import importlib
    pkg = "big_data_science_project_spark"
    touched_oracles = set()
    for short in TOUCHED_MODULES:
        mod = None
        for cand in (f"{pkg}.operators.{short}", f"{pkg}.streaming.{short}",
                     f"{pkg}.sources.{short}"):
            try:
                mod = importlib.import_module(cand)
                break
            except ImportError:
                continue
        assert mod is not None, f"TOUCHED_MODULES names unknown module {short}"
        touched_oracles |= {n for n, (fn, sql) in
                            getattr(mod, "QUERIES", {}).items()
                            if sql is not None}
    # the surgical tier (sub-module reach sets) is mandatory too, and
    # must name real value oracles
    assert set(TOUCHED_QUERIES) <= set(oracles), (
        "TOUCHED_QUERIES names a non-oracle or unknown query")
    touched_oracles |= set(TOUCHED_QUERIES)
    missing = touched_oracles - set(window)
    assert not missing, (
        f"touched-module oracles outside the driver window: {sorted(missing)}")

    # (c) the refill tail is least-recent-first
    n_mand = len(CANARIES) + len(touched_oracles - set(CANARIES))
    refill_rounds = [LAST_VERIFIED.get(n, 0) for n in window[n_mand:]]
    assert refill_rounds == sorted(refill_rounds), (
        "refill section is not least-recently-verified-first")
    # and nothing OUTSIDE the window is older than the refill's newest
    # (the policy really picked the oldest)
    if refill_rounds:
        outside = [LAST_VERIFIED.get(n, 0)
                   for n in oracles if n not in window]
        assert all(r >= refill_rounds[-1] for r in outside), (
            "an oracle older than the refill tail was left outside the window")

    # (d) history names are registry names
    unknown = set(LAST_VERIFIED) - set(oracles)
    assert not unknown, f"history table names unknown oracles: {sorted(unknown)}"


def test_selfcheck_trio_generated_at_committed_engine_state():
    """r13 verdict item 5 (process gap: the r13 trio predated the
    round's final engine commits): each cited selfcheck artifact must
    carry the git_head stamp tools/selfcheck.py records, the engine
    tree must have been CLEAN at generation time, and no engine source
    (big_data_science_project_spark/, __spark_entry__.py, bench.py)
    may have changed between that commit and the repo's HEAD — i.e.
    the committed trio really describes the committed engine."""
    import subprocess

    repo = os.path.dirname(README)
    engine_paths = ["big_data_science_project_spark",
                    "__spark_entry__.py", "bench.py"]
    for path in _selfcheck_artifacts(open(README).read()):
        full = os.path.join(repo, path)
        with open(full) as f:
            s = json.load(f)["summary"]
        assert "git_head" in s, (
            f"{path} has no git_head stamp — regenerate with the "
            "stamped tools/selfcheck.py")
        assert not s.get("engine_dirty"), (
            f"{path} was generated with uncommitted engine changes")
        r = subprocess.run(
            ["git", "-C", repo, "diff", "--name-only",
             f"{s['git_head']}..HEAD", "--"] + engine_paths,
            capture_output=True, text=True)
        assert r.returncode == 0, (
            f"{path}'s stamped commit {s['git_head'][:12]} is not in "
            "this repo's history")
        changed = r.stdout.strip().splitlines()
        assert not changed, (
            f"engine source changed after {path} was generated: "
            f"{changed} — regenerate the selfcheck trio")
