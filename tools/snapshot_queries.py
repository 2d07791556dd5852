"""Bit-exact A/B snapshot of every declared query.

Runs each ``__spark_entry__.queries()`` entry at the given sf dir and
hashes the EXACT result (rows sorted; floats hashed by their IEEE bit
pattern, not a rounded string), writing ``{name: sha256}`` to a JSON
file. Running this before and after an optimization and diffing the
two files proves the optimization changed no declared query's output
at all — stronger than the 9-significant-digit oracle mirror in
``check_gate.py``.

Usage: python tools/snapshot_queries.py <sf_dir> <out.json> [query ...]
"""

from __future__ import annotations

import hashlib
import json
import struct
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import __spark_entry__ as entrymod  # noqa: E402
from cminer_spark import get_spark  # noqa: E402


def cell_key(v):
    if isinstance(v, float):
        return "f:" + struct.pack("<d", v).hex()
    if isinstance(v, bool):
        return "b:" + str(v)
    if isinstance(v, int):
        return "i:" + str(v)
    if v is None:
        return "null"
    return "s:" + repr(v)


def df_hash(df) -> tuple[str, int]:
    cols = df.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = df.collect()
    keyed = sorted("|".join(cell_key(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    h.update(("#cols:" + ",".join(sorted(cols))).encode())
    for k in keyed:
        h.update(k.encode())
        h.update(b"\n")
    return h.hexdigest(), len(rows)


def main() -> None:
    sf_dir = sys.argv[1]
    out_path = sys.argv[2]
    only = set(sys.argv[3:])
    spark = get_spark("snapshot-queries")
    entrymod._ship_package(spark)
    qs = entrymod.queries()
    out = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            h, n = df_hash(fn(spark, sf_dir))
            out[name] = {"hash": h, "rows": n}
            status = f"{h[:12]} rows={n}"
        except Exception as exc:  # noqa: BLE001
            out[name] = {"error": f"{type(exc).__name__}: {exc}"}
            status = f"ERROR {type(exc).__name__}: {exc}"
        print(
            f"[snap] {name}: {status} ({time.time() - t0:.1f}s)",
            file=sys.stderr,
            flush=True,
        )
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(out_path)


if __name__ == "__main__":
    main()
