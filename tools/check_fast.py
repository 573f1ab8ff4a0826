#!/usr/bin/env python3
"""Vectorized oracle compare for LARGE scale factors (round-13 sf1 proof).

Same contract as check.py (positional row compare, columns sorted by
name, NaN==NaN, -0.0 != 0.0) but column-vectorized via numpy/pyarrow so
multi-million-row outputs (agg_unpivot is 18M rows at sf1) compare in
seconds instead of hours. check.py stays the authoritative local
stand-in at driver scale; this exists so the scale-decade loop is
runnable. Columns with nested/list types fall back to check.py's
per-value norm loop (those queries emit small outputs).

Usage: python3 tools/check_fast.py <sfDir> <verifyOutDir> [query ...]
"""
import glob
import json
import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from check import TABLES, norm  # noqa: E402


def col_equal(a: pa.ChunkedArray, b: pa.ChunkedArray):
    """Index of first mismatch, or None. NaN==NaN; -0.0 vs 0.0 differs
    (check.py's %.17g renders them '0' vs '-0'); NULL only equals NULL."""
    t = a.type
    if pa.types.is_floating(t):
        x = a.to_numpy(zero_copy_only=False)
        y = b.cast(t).to_numpy(zero_copy_only=False)
        # to_numpy maps NULL to NaN for floats — disambiguate via masks
        anull = pc.is_null(a).to_numpy(zero_copy_only=False)
        bnull = pc.is_null(b).to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore"):
            same = (x == y) & (np.signbit(x) == np.signbit(y))
            same |= np.isnan(x) & np.isnan(y) & ~anull & ~bnull
        same |= anull & bnull
        same &= anull == bnull
        bad = np.nonzero(~same)[0]
        return int(bad[0]) if bad.size else None
    if (pa.types.is_nested(t) or pa.types.is_nested(b.type)):
        # small-output path: reuse check.py's value norm
        av, bv = a.to_pylist(), b.to_pylist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if norm(x) != norm(y):
                return i
        return None
    try:
        bb = b.cast(t)
    except pa.ArrowInvalid:
        return 0
    eq = pc.equal(a, bb)  # NULL-propagating
    both_null = pc.and_(pc.is_null(a), pc.is_null(bb))
    ok = pc.or_kleene(pc.fill_null(eq, False), both_null)
    if isinstance(ok, pa.ChunkedArray):
        ok = ok.combine_chunks()
    bad = np.nonzero(~ok.to_numpy(zero_copy_only=False))[0]
    return int(bad[0]) if bad.size else None


def prep(col: pa.ChunkedArray) -> pa.ChunkedArray:
    """Combine chunks for col_equal — with the 64-bit-offset upcast a
    >2 GiB string/binary column needs first (sf30's agg_unpivot emits
    540M metric-name strings; int32 offsets overflow on concatenation).
    Nested columns are left chunked: col_equal's nested branch iterates
    via to_pylist and never concatenates."""
    t = col.type
    if pa.types.is_string(t):
        col = col.cast(pa.large_string())
    elif pa.types.is_binary(t):
        col = col.cast(pa.large_binary())
    elif pa.types.is_nested(t):
        return col
    return col.combine_chunks()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    # Optional caps so compares can overlap a big Verify JVM on the same
    # host (DuckDB's default memory_limit is 80% of RAM — beside an 80g
    # heap that invites the OOM killer). Unset = previous behavior.
    if os.environ.get("GRAFT_DUCK_MEM"):
        con.execute(f"SET memory_limit='{os.environ['GRAFT_DUCK_MEM']}'")
    if os.environ.get("GRAFT_DUCK_THREADS"):
        con.execute(f"SET threads TO {int(os.environ['GRAFT_DUCK_THREADS'])}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    n_pass = n_fail = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output", flush=True)
            n_fail += 1
            continue
        s = pq.read_table(files[0])
        s = s.select(sorted(s.column_names))
        try:
            d = con.execute(oracles[name]).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}", flush=True)
            n_fail += 1
            continue
        d = d.select(sorted(d.column_names))
        if s.column_names != d.column_names:
            print(f"FAIL {name}: cols spark={s.column_names} "
                  f"duck={d.column_names}", flush=True)
            n_fail += 1
            continue
        if s.num_rows != d.num_rows:
            print(f"FAIL {name}: rows spark={s.num_rows} duck={d.num_rows}",
                  flush=True)
            n_fail += 1
            continue
        bad = None
        for c in s.column_names:
            i = col_equal(prep(s.column(c)), prep(d.column(c)))
            if i is not None:
                bad = (c, i, s.column(c)[i].as_py(), d.column(c)[i].as_py())
                break
        if bad:
            print(f"FAIL {name}: col {bad[0]} row {bad[1]}: "
                  f"spark={norm(bad[2])} duck={norm(bad[3])}", flush=True)
            n_fail += 1
        else:
            print(f"PASS {name} ({s.num_rows} rows)", flush=True)
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
