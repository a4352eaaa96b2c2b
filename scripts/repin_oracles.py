"""Tooling for the VALUE-PINNED oracle rows — the only oracle class
that embeds sf0.01 literals in ``oracle_sql()`` instead of computing
them relationally (t-digest/eigen/HLL/seeded-fit results DuckDB cannot
replay). Four queries carry pins today:

- ``ann_pq_topk``      — per-query ADC / rerank hit counts (VALUES)
- ``ann_ivf_topk``     — per-query probe / exhaustive hit counts (VALUES)
- ``pca_project``      — per-component proj_var / ev_share (VALUES)
- ``approx_group_stats`` — HLL++ distinct estimate per group (CASE)

The pins are deterministic on fixed data (hash-ordered fit samples,
register max-merge, seed-free Lloyd's) — but a REGENERATED testdata
corpus silently flips them red. Since round 6 each oracle carries
literals for BOTH harness scale factors, dispatched on the lineitem
row count (6000 = sf0.001, 60000 = sf0.01 — the embeddings table has
500 rows at every SF, so its own count cannot identify the corpus);
``--print`` at a given sf_dir emits that corpus's arm, to be pasted
into the matching rows of the VALUES block. This script is the
recovery path:

    python scripts/repin_oracles.py            # --verify (default):
        run each pinned Spark query at sf0.01 and its committed oracle
        SQL on DuckDB, assert the pinned values still match; exit 1
        with a per-value diff when they don't.
    python scripts/repin_oracles.py --print    # regeneration mode:
        run the Spark queries and print fresh, paste-ready SQL blocks
        for __spark_entry__.oracle_sql().

``--verify`` is also wired into pytest
(tests/test_oracle_harness.py::test_pinned_oracles_verify, marked
slow) so a pin/testdata drift fails CI rather than the next round's
driver snapshot.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entry
from pd_utils_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# name -> (key column, pinned columns). Key columns align the Spark
# recompute with the committed literals; every other listed column is
# a pinned value whose literal lives in oracle_sql().
PINNED: dict[str, tuple[str, list[str]]] = {
    "ann_pq_topk": ("query_id", ["k", "adc_hits", "rerank_hits"]),
    "ann_ivf_topk": ("query_id", ["k", "approx_hits", "exhaustive_hits"]),
    "pca_project": ("component", ["proj_var", "ev_share"]),
    "approx_group_stats": ("l_returnflag", ["n_distinct_approx"]),
}


def _fmt(v) -> str:
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, str):
        return f"'{v}'"
    return str(v)


def _spark_rows(spark, sf_dir: str, name: str) -> list[dict]:
    key, _ = PINNED[name]
    df = entry.queries()[name](spark, sf_dir)
    return [r.asDict() for r in df.orderBy(key).collect()]


def render(name: str, rows: list[dict]) -> str:
    """Fresh, paste-ready oracle SQL snippet for one pinned query."""
    if name == "approx_group_stats":
        cases = " ".join(
            f"WHEN '{r['l_returnflag']}' THEN {r['n_distinct_approx']}"
            for r in rows[:-1]
        )
        return (
            f"CASE l_returnflag {cases} "
            f"ELSE {rows[-1]['n_distinct_approx']} END AS n_distinct_approx"
        )
    if name == "pca_project":
        vals = ", ".join(
            f"({r['component']}, {_fmt(r['proj_var'])}, {_fmt(r['ev_share'])})"
            for r in rows
        )
        return (
            "SELECT component,\n"
            "       (SELECT count(*) FROM embeddings) AS n_projected,\n"
            "       CAST(proj_var AS DOUBLE) AS proj_var,\n"
            "       CAST(ev_share AS DOUBLE) AS ev_share\n"
            f"FROM (VALUES {vals}) AS t(component, proj_var, ev_share)"
        )
    key, cols = PINNED[name]
    names = ", ".join([key, *cols])
    vals = ", ".join(
        "(" + ", ".join(_fmt(r[c]) for c in [key, *cols]) + ")" for r in rows
    )
    return f"SELECT * FROM (VALUES {vals}) AS t({names})"


def verify(spark, con, sf_dir: str) -> int:
    oracles = entry.oracle_sql()
    failures = 0
    for name, (key, cols) in PINNED.items():
        fresh = {r[key]: r for r in _spark_rows(spark, sf_dir, name)}
        pinned = {
            r[key]: r
            for r in con.execute(oracles[name]).fetchdf().to_dict("records")
        }
        bad = []
        if set(fresh) != set(pinned):
            bad.append(f"keys: fresh={sorted(fresh)} pinned={sorted(pinned)}")
        else:
            for kv, fr in fresh.items():
                for c in cols:
                    fv, pv = fr[c], pinned[kv][c]
                    ok = (
                        abs(float(fv) - float(pv)) < 1e-12
                        if isinstance(fv, float)
                        else fv == pv
                    )
                    if not ok:
                        bad.append(f"{key}={kv} {c}: fresh={fv!r} pinned={pv!r}")
        if bad:
            failures += 1
            print(f"{name:24s} STALE PIN")
            for b in bad:
                print(f"    {b}")
        else:
            print(f"{name:24s} pins verified ({len(fresh)} rows)")
    return failures


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    mode = "print" if "--print" in sys.argv else "verify"

    spark = get_spark("repin_oracles")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    if mode == "verify":
        failures = verify(spark, con, sf_dir)
        print("\n" + ("ALL PINS OK" if failures == 0 else f"{failures} STALE"))
        sys.exit(1 if failures else 0)

    for name in PINNED:
        rows = _spark_rows(spark, sf_dir, name)
        print(f"-- {name} ({sf_dir})")
        print(render(name, rows))
        print()


if __name__ == "__main__":
    main()
