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
            # content too (r12 verdict item 2): every rung of every
            # batch-vs-index gate must admit its fresh plants — before
            # the fresh-clip generators got their own salted families,
            # scaled indexes swallowed them as exact twins and the
            # x10/x100 rungs proved detection but not precision
            if "tiers" in entry[rung]:
                assert entry[rung]["tiers"].get("admitted", 0) > 0, (
                    f"{name} {rung}: no fresh item admitted — the "
                    "fresh plants collided with the scaled index")
