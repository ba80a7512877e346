#!/usr/bin/env python
"""Simulate the driver's verify flow against __spark_entry__.py.

Builds a SparkSession the way the DRIVER would (deliberately NOT via
projectmapreduce_spark.session — including a hostile non-UTC timezone
to prove queries self-repair their session conf), then:

1. smoke: entry(spark) at sf0.001 → collect, assert rows > 0
2. correctness: every queries()[name] at sf0.01 vs oracle_sql()[name]
   via DuckDB (row-count + schema + order-insensitive value canon)

Usage: python scripts/driver_sim.py [--sf-dir DIR] [name ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

import duckdb
from pyspark.sql import SparkSession

_REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, _REPO)
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
# Executor-side Python workers unpickle classes (the DataSource
# connector) BY REFERENCE, so the repo package must be importable in
# the worker processes too.  With cwd == repo root that happens via
# the '' sys.path entry; exporting PYTHONPATH makes driver_sim
# cwd-independent (the local-mode workers inherit the JVM's env,
# which inherits ours).  A real cluster ships the package with
# --py-files / the image instead.
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

import __spark_entry__ as entrymod
from oracle_utils import _canon_frame, dtype_families  # strict, type-sensitive canon

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# Files whose change invalidates EVERY query's verification (shared
# session conf, the registry/canonicalizer machinery, this harness) —
# --changed-since falls back to the full sweep when any of these moved.
_GLOBAL_IMPACT = {
    "__spark_entry__.py",
    "tests/oracle_utils.py",
    "scripts/driver_sim.py",
    "projectmapreduce_spark/session.py",
    "projectmapreduce_spark/queries/__init__.py",
    "projectmapreduce_spark/queries/registry.py",
}


def select_changed(sha: str, qs: dict, meta: dict) -> list[str] | None:
    """Map ``git diff --name-only <sha>`` onto the query catalog.

    Returns the selected query names, or None for "run the full sweep"
    (a global-impact file changed).  Three selection channels:

    1. a changed module under projectmapreduce_spark/ selects every
       query DEFINED in it (META's ``module`` tag);
    2. the reverse-transitive import closure — queries defined in any
       package module that imports a changed module (so an operator or
       source edit selects the queries built on it);
    3. a changed tests/ or scripts/ .py file selects every query whose
       name appears in its worktree text (a test edit provably selects
       the queries it exercises).
    """
    import re
    import subprocess

    out = subprocess.check_output(
        ["git", "-C", _REPO, "diff", "--name-only", sha], text=True
    )
    # Union in untracked files (ADVICE r9): `git diff` alone excludes
    # a brand-new, not-yet-staged query module or test, which would
    # make the incremental signal silently empty exactly when new
    # queries exist.
    untracked = subprocess.check_output(
        ["git", "-C", _REPO, "ls-files", "--others", "--exclude-standard"],
        text=True,
    )
    changed = sorted(
        {f.strip() for f in (out.splitlines() + untracked.splitlines()) if f.strip()}
    )
    hit_global = sorted(set(changed) & _GLOBAL_IMPACT)
    if hit_global:
        print(f"[changed-since] global-impact change ({hit_global[0]}) -> full sweep")
        return None
    # Package module graph (importer -> imported), for the closure.
    pkg_root = Path(_REPO, "projectmapreduce_spark")
    mod_of: dict[str, str] = {}  # repo-relative path -> dotted module
    for p in pkg_root.rglob("*.py"):
        rel = str(p.relative_to(_REPO))
        mod = rel[: -len(".py")].replace(os.sep, ".")
        if mod.endswith(".__init__"):
            mod = mod[: -len(".__init__")]
        mod_of[rel] = mod
    rx = re.compile(r"^\s*(?:from|import)\s+(projectmapreduce_spark[\w.]*)", re.M)
    known = set(mod_of.values())
    imports: dict[str, set[str]] = {}
    for rel, mod in mod_of.items():
        deps = set()
        for hit in rx.findall(Path(_REPO, rel).read_text(errors="ignore")):
            while hit and hit not in known:
                hit = hit.rsplit(".", 1)[0] if "." in hit else ""
            if hit and hit != mod:
                deps.add(hit)
        imports[mod] = deps
    affected = {mod_of[f] for f in changed if f in mod_of}
    grew = True
    while grew:
        grew = False
        for mod, deps in imports.items():
            if mod not in affected and deps & affected:
                affected.add(mod)
                grew = True
    sel = {n for n in qs if meta[n].get("module") in affected}
    # Channel 3: test/script edits name the queries they exercise.
    for f in changed:
        if not (f.startswith(("tests/", "scripts/")) and f.endswith(".py")):
            continue
        p = Path(_REPO, f)
        if p.exists():
            txt = p.read_text(errors="ignore")
            sel |= {n for n in qs if n in txt}
    print(
        f"[changed-since] {len(changed)} changed paths -> "
        f"{len(affected)} affected modules -> {len(sel)} queries"
    )
    return sorted(sel)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--hostile-tz", default="America/Los_Angeles")
    ap.add_argument("--master", default="local[8]", help="vary parallelism to prove partition-count independence")
    ap.add_argument(
        "--driver-mem",
        default="8g",
        help="JVM heap; the 1g pyspark default OOMs on the sf1 synth tier",
    )
    ap.add_argument(
        "--duck-mem",
        default="24GB",
        help="DuckDB memory_limit for the oracle side; the 80%%-of-RAM "
        "default lets one pathological oracle page the whole machine "
        "instead of erroring (observed: 109 GB RSS at the sf1 tier)",
    )
    ap.add_argument(
        "--sample",
        type=int,
        default=0,
        help="run a seeded random N-query subset instead of the full "
        "catalog — the cheap pre-commit rotation that approximates the "
        "external driver's frozen 50-query sample (the full sweep stays "
        "the release gate)",
    )
    ap.add_argument("--seed", type=int, default=0, help="seed for --sample")
    ap.add_argument(
        "--dump-canon",
        default="",
        help="write {query: sha256(canonical values)} JSON here — diff "
        "two runs (e.g. --master local[2] vs local[32]) to prove "
        "partition-count independence INCLUDING rows-only queries the "
        "oracle can't hash-check",
    )
    ap.add_argument(
        "--lane",
        choices=("all", "batch", "streaming"),
        default="all",
        help="sweep lane: 'batch' excludes the streaming drains, "
        "'streaming' runs only them.  The drains cost minutes each at "
        "sf1 (checkpoint + micro-batch scheduling scales with volume) "
        "while batch queries stay ~1s — running the lanes back-to-back "
        "keeps the FULL catalog inside a recorded per-tier budget "
        "instead of truncating mid-sweep",
    )
    ap.add_argument(
        "--skip",
        action="append",
        default=[],
        help="query names to EXCLUDE from a sweep, printed so the "
        "exclusion is recorded (e.g. m11_triangle_count on the skew "
        "tier, whose near-complete co-supply graph makes the exact "
        "count a documented resource-refusal case — BASELINE.md note)",
    )
    ap.add_argument(
        "--changed-since",
        default="",
        metavar="SHA",
        help="incremental per-commit gate (VERDICT r8 task 6): run only "
        "the queries whose query/operator/oracle code changed vs SHA — "
        "selection = queries defined in a changed package module, plus "
        "queries defined in any module that (transitively) imports a "
        "changed module, plus queries named in a changed tests/ or "
        "scripts/ file.  A change to a global-impact file (registry, "
        "session, entry, canonicalizer, this script) falls back to the "
        "full sweep.  The FULL sweep remains the release gate.",
    )
    ap.add_argument(
        "--release-spark",
        action="store_true",
        help="stop (and lazily recreate) the SparkSession after each "
        "engine result is collected, BEFORE the DuckDB oracle runs — "
        "Spark's blockmgr shuffle/checkpoint files persist for the "
        "session lifetime, and for disk-heavy pairs (m11's wedge join: "
        "~27 GB blockmgr + ~38 GB oracle spill on the organic sf1 "
        "graph) the two sides cannot coexist inside the machine's "
        "spill budget.  Costs ~15 s of JVM restart per query; use for "
        "targeted heavy-query runs, never needed at sf0.01",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    def make_spark():
        builder = (
            SparkSession.builder.master(args.master)
            .appName("driver-sim")
            .config("spark.sql.session.timeZone", args.hostile_tz)
            .config("spark.driver.memory", args.driver_mem)
            .config("spark.ui.enabled", "false")
        )
        # Parallel-sweep isolation: when $SPARK_GRAFT_SCRATCH redirects
        # the query scratch root (io.scratch_path), redirect the
        # managed-table warehouse with it — sink_managed queries (s22)
        # would otherwise race on the shared spark-warehouse/ directory
        # across processes.
        if os.environ.get("SPARK_GRAFT_SCRATCH"):
            builder = builder.config(
                "spark.sql.warehouse.dir",
                os.path.join(os.environ["SPARK_GRAFT_SCRATCH"], "warehouse"),
            )
        return builder.getOrCreate()

    spark = make_spark()

    # --- smoke ---
    t0 = time.time()
    out = entrymod.entry(spark)
    rows = out.collect()
    print(f"[smoke] entry() -> {len(rows)} rows, schema={out.schema.simpleString()}")
    print(f"[smoke] first row: {rows[0]}")
    assert len(rows) > 0

    # --- correctness ---
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{args.duck_mem}'")
    con.execute("SET threads=8")
    # DuckDB's default spill dir is the CWD-relative ".tmp/" — two
    # concurrent driver_sims (parallel tier sweeps) share it and one
    # process's cleanup deletes the other's live temp file, crashing
    # the survivor with an uncaught IO exception (observed killing a
    # 111-query hostile sweep mid-run).  A pid-unique dir isolates
    # each process's spill.
    duck_tmp = os.path.join(".tmp", f"duck_{os.getpid()}")
    os.makedirs(duck_tmp, exist_ok=True)
    con.execute(f"SET temp_directory='{duck_tmp}'")
    # Reap ORPHANED spill dirs (round 10): a killed sweep leaves its
    # duck_<pid> behind — a 14 GB stale dir plus a live oracle's spill
    # exhausted the disk mid-run.  A dir whose pid is dead is garbage.
    # Scoped (ADVICE r10) to names matching duck_\d+ EXACTLY so a
    # duck_<non-integer> dir some other tool created is never rmtree'd
    # via a ValueError branch; pid-reuse keeping a dead dir alive is
    # the conservative direction and acceptable.
    import re
    import shutil

    for d in os.listdir(".tmp"):
        m = re.fullmatch(r"duck_(\d+)", d)
        if not m or d == f"duck_{os.getpid()}":
            continue
        try:
            os.kill(int(m.group(1)), 0)
        except ProcessLookupError:
            shutil.rmtree(os.path.join(".tmp", d), ignore_errors=True)
        except PermissionError:
            pass  # pid alive under another uid — leave it
    for t in TABLES:
        # Driver fixtures are single files; Spark-written tiers (the
        # sf1 synth data) are directories of part files — glob those.
        p = f"{args.sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    names = args.names or sorted(qs)
    if args.changed_since and not args.names:
        from projectmapreduce_spark.queries import META

        picked = select_changed(args.changed_since, qs, META)
        if picked is not None:
            names = picked
            if not names:
                print("[changed-since] no query-affecting changes; nothing to run")
    if args.lane != "all" and args.names:
        # ADVICE r7 item 2: the lane filter only applies to full-catalog
        # sweeps; explicit names run regardless of lane, so say so
        # instead of silently ignoring the flag.
        print(f"[lane] WARNING: --lane {args.lane} ignored — explicit query names given")
    if args.lane != "all" and not args.names:
        from projectmapreduce_spark.queries import streaming_query_names

        drains = streaming_query_names()
        names = [n for n in names if (n in drains) == (args.lane == "streaming")]
        print(f"[lane] {args.lane}: {len(names)} queries")
    if args.skip:
        skipped = [n for n in names if n in set(args.skip)]
        names = [n for n in names if n not in set(args.skip)]
        print(f"[skip] excluded {len(skipped)}: {' '.join(skipped)}")
    if args.sample and not args.names:
        import random

        names = sorted(random.Random(args.seed).sample(names, min(args.sample, len(names))))
        print(f"[sample] seed={args.seed} -> {len(names)} queries: {' '.join(names)}")
    n_pass = n_fail = n_rows_only = 0
    canon_hashes: dict[str, str] = {}

    def _record_canon(name: str, sp) -> None:
        if not args.dump_canon:
            return
        import hashlib

        canon_hashes[name] = hashlib.sha256(
            repr(_canon_frame(sp)).encode()
        ).hexdigest()

    for name in names:
        t0 = time.time()
        try:
            if spark is None:
                spark = make_spark()
            sdf = qs[name](spark, args.sf_dir)
            sp = sdf.toPandas()
            if args.release_spark:
                # Engine result is fully collected — free the session's
                # blockmgr disk before the oracle spills.
                spark.stop()
                spark = None
            _record_canon(name, sp)
            if name not in oracles:
                n_rows_only += 1
                print(f"[rows-only] {name}: {len(sp)} rows ({time.time()-t0:.1f}s)")
                continue
            du = con.execute(oracles[name]).fetchdf()
            ok_schema = sorted(sp.columns) == sorted(du.columns)
            ok_count = len(sp) == len(du)
            # The driver's value-hash is type-sensitive (int != float), so
            # pandas dtype families must match, not just canonical values.
            ok_dtype = ok_schema and dtype_families(sp) == dtype_families(du)
            ok_vals = (
                ok_schema and ok_count and ok_dtype and _canon_frame(sp) == _canon_frame(du)
            )
            if ok_vals:
                n_pass += 1
                print(f"[PASS] {name}: {len(sp)} rows ({time.time()-t0:.1f}s)")
            else:
                n_fail += 1
                print(
                    f"[FAIL] {name}: schema_ok={ok_schema} dtype_ok={ok_dtype} "
                    f"count={len(sp)}vs{len(du)}"
                )
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            print(f"[ERROR] {name}: {type(e).__name__}: {e}")
    print(f"\n{n_pass} pass / {n_fail} fail / {n_rows_only} rows-only")
    if args.dump_canon:
        import json

        with open(args.dump_canon, "w") as fh:
            json.dump(canon_hashes, fh, indent=1, sort_keys=True)
        print(f"[canon] wrote {len(canon_hashes)} hashes to {args.dump_canon}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
