"""Documentation count hygiene: README's query/oracle/rows-only claims
must equal the live registry. Hand-typed counts went stale twice (README
in r4, CHANGES_r05 in r5) — this test ends the class by asserting every
numeric claim against `collect_registry()` itself. No Spark session
needed; the registry is plain dicts."""
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

    # every "N oracle matches" sentence (selfcheck summaries) must cite
    # the live oracle count
    for n in re.findall(r"(\d+) oracle matches", flat):
        assert int(n) == n_o, (
            f"README cites {n} oracle matches, registry has {n_o}")


def test_oracles_are_subset_of_queries():
    queries, oracles = collect_registry()
    extra = set(oracles) - set(queries)
    assert not extra, f"oracles without a query: {sorted(extra)}"
