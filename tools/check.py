#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (dev tool only; the
shipped library is pure Scala). Usage:

    python3 tools/check.py <sfDir> <outDir> [key ...]

Reads <outDir>/oracle_sql.json (written by graft.Verify), runs each SQL in
DuckDB over views named after the parquet tables in <sfDir>, and compares
exactly (columns sorted by name; values including row order) against the
Spark result parquet at <outDir>/<key>/.
"""
import json, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def pa_is_nested(t):
    import pyarrow.types as pt
    return (pt.is_list(t) or pt.is_large_list(t) or pt.is_fixed_size_list(t)
            or pt.is_struct(t) or pt.is_map(t))

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # validate the key filter up front: a typo'd key would otherwise
    # skip everything and exit 0 — green on a gate that never ran (the
    # Verify/Bench unknown-keys guard, ported)
    known = set(oracle)
    keys_path_early = f"{out_dir}/keys.json"
    if os.path.exists(keys_path_early):
        known |= set(json.load(open(keys_path_early)))
    else:
        # legacy dump without keys.json: the dir scan below checks
        # rows-only keys, so their names are valid filters too — without
        # this a registered rows-only key passed as a filter was
        # rejected with exit 2 despite its result dir existing
        known |= {os.path.basename(d.rstrip("/"))
                  for d in glob.glob(f"{out_dir}/*/")}
    unknown = only - known
    if unknown:
        print(f"[FAIL] unknown keys: {sorted(unknown)}")
        sys.exit(2)
    n_ok = n_bad = n_warn = 0
    for key, sql in sorted(oracle.items()):
        if only and key not in only:
            continue
        res_glob = sorted(glob.glob(f"{out_dir}/{key}/*.parquet"))
        if not res_glob:
            print(f"[FAIL] {key}: no spark result parquet")
            n_bad += 1
            continue
        try:
            want = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"[FAIL] {key}: oracle sql error: {e}")
            n_bad += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({res_glob!r})").fetch_arrow_table()
        except Exception as e:
            # a truncated/corrupt result file must fail THIS key, not
            # abort the gate before the summary line the driver parses
            print(f"[FAIL] {key}: spark result unreadable: {e}")
            n_bad += 1
            continue
        # The driver's comparator (pandas sort_values -> factorize) crashes
        # on non-scalar cells (TypeError: unhashable type 'numpy.ndarray'),
        # so ANY list/struct/map-typed result column means the key ships
        # untested by the binding gate. Reject it here, hard — the repo
        # rule is "array-typed outputs must leave as strings"
        # (Aggregates.scala, agg_collect / label_centroid pattern:
        # array_join in Spark, array_to_string in the DuckDB oracle).
        nested = [(side, c, str(tb.schema.field(c).type))
                  for side, tb in (("spark", got), ("oracle", want))
                  for c in tb.column_names
                  if pa_is_nested(tb.schema.field(c).type)]
        if nested:
            side, c, t = nested[0]
            print(f"[FAIL] {key}: {side} col {c} is nested type {t} — the "
                  "driver comparator cannot hash it; serialize to a "
                  "canonical string (array_join / array_to_string)"
                  + (f" (+{len(nested)-1} more)" if len(nested) > 1 else ""))
            n_bad += 1
            continue
        wcols, gcols = sorted(want.column_names), sorted(got.column_names)
        if wcols != gcols:
            print(f"[FAIL] {key}: columns differ: oracle={wcols} spark={gcols}")
            n_bad += 1
            continue
        # The driver's hash is type-sensitive: Decimal(3) == 3 == 3.0 in
        # Python, so a value-only compare ships type-level divergences
        # green (bit us twice: DuckDB list_sum -> HUGEINT vs Spark INT;
        # bare decimal literals -> decimal(27,14) vs decimal(18,14)).
        # Compare arrow types column by column. Integer WIDTHS are
        # interchangeable (22 driver-green keys pair BIGINT with INT),
        # but int vs decimal vs float, and decimal precision/scale, are
        # exactly what the driver hashes apart — keep those exact.
        def tclass(t):
            import pyarrow.types as pt
            return "int" if pt.is_integer(t) else str(t)
        tbad = [(c, str(want.schema.field(c).type), str(got.schema.field(c).type))
                for c in wcols
                if tclass(want.schema.field(c).type)
                   != tclass(got.schema.field(c).type)]
        if tbad:
            c, tw, tg = tbad[0]
            print(f"[FAIL] {key}: col {c} arrow type: oracle={tw} spark={tg}"
                  + (f" (+{len(tbad)-1} more cols)" if len(tbad) > 1 else ""))
            n_bad += 1
            continue
        w = want.select(wcols).to_pylist()
        g = got.select(gcols).to_pylist()
        if len(w) != len(g):
            print(f"[FAIL] {key}: rowcount oracle={len(w)} spark={len(g)}")
            n_bad += 1
            continue
        def cell_eq(a, b):
            # NaN == NaN for gate purposes: the driver's factorize codes
            # NaN identically on both sides, while != would fail a cell
            # both engines agree is NaN
            if isinstance(a, float) and isinstance(b, float) \
                    and a != a and b != b:
                return True
            return a == b
        def first_diff(ws, gs):
            for i, (rw, rg) in enumerate(zip(ws, gs)):
                for c in wcols:
                    if not cell_eq(rw[c], rg[c]):
                        return (i, c, rw[c], rg[c])
            return None
        bad = first_diff(w, g)
        if bad:
            # driver parity: the binding comparator SORTS rows before
            # hashing, so a pure tie-order divergence is driver-green.
            # Keep the strict pass as the primary signal but fall back
            # to the sorted compare, loudly, instead of failing a key
            # the real gate would pass.
            # normalize -0.0 -> 0.0 in the sort key: the values are ==
            # but their reprs differ, which would misalign the two
            # sorted lists and fail a key the driver's pandas
            # comparator (where -0.0 == 0.0) passes
            norm = lambda v: 0.0 if isinstance(v, float) and v == 0.0 else v
            skey = lambda r: tuple(repr(norm(r[c])) for c in wcols)
            if first_diff(sorted(w, key=skey), sorted(g, key=skey)) is None:
                # counted in n_warn (surfaced in the exit summary):
                # driver-green, but silent accumulation of tie-order
                # drift would hide genuinely nondeterministic ORDER BYs
                print(f"[warn] {key}: {len(w)} rows match only after "
                      "sorting — tie-order divergence (driver-green); "
                      "tighten the ORDER BY")
                n_ok += 1
                n_warn += 1
            else:
                i, c, a, b = bad
                print(f"[FAIL] {key}: row {i} col {c}: "
                      f"oracle={a!r} spark={b!r}")
                n_bad += 1
        else:
            print(f"[ ok ] {key}: {len(w)} rows")
            n_ok += 1
    # rows-only keys (registered but no oracle). Enumerate from the
    # EXPECTED key list when Verify dumped one: a rows-only key whose
    # Spark job failed has its dir deleted, and scanning surviving dirs
    # alone would make that failure invisible to the gate.
    keys_path = f"{out_dir}/keys.json"
    if os.path.exists(keys_path):
        all_keys = json.load(open(keys_path))
        rows_only = [k for k in all_keys if k not in oracle]
    else:  # legacy dump: best-effort dir scan
        rows_only = sorted(
            os.path.basename(d.rstrip("/"))
            for d in glob.glob(f"{out_dir}/*/")
            if os.path.basename(d.rstrip("/")) not in oracle)
    for key in rows_only:
        if only and key not in only:
            continue
        files = sorted(glob.glob(f"{out_dir}/{key}/*.parquet"))
        if not files:
            print(f"[FAIL] {key}: rows-only key produced no result parquet")
            n_bad += 1
            continue
        try:
            t = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
        except Exception as e:
            print(f"[FAIL] {key}: rows-only result unreadable: {e}")
            n_bad += 1
            continue
        n = t.num_rows
        schema = t.schema
        nested = [f.name for f in schema if pa_is_nested(f.type)]
        tag = "ok" if n > 0 else "WARN-EMPTY"
        if n == 0 or nested:
            n_warn += 1
        note = f" [WARN nested cols: {nested}]" if nested else ""
        print(f"[{tag:>4}] {key}: rows-only check, {n} rows{note}")
    warn_note = f", {n_warn} warned" if n_warn else ""
    print(f"== {n_ok} ok, {n_bad} failed{warn_note} ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
