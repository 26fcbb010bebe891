"""Hardware capacity calibration for the scaling protocol.

Measures what this box can PHYSICALLY scale from K to 4K independent
worker processes — no Ray, no coordination, no shared state: each
worker burns the same fixed quantum of pyarrow string kernels + numpy
hashing (the headline pipeline's kernel mix) and reports items/s.
The aggregate throughput ratio (4K workers vs K workers) is the
ceiling on any measured pipeline "scaling efficiency" at the same
levels: shared-host steal, frequency scaling, and SMT sharing all land
here, not in the pipeline.

Two modes, because the two resources scale very differently on a
shared single node:

- ``compute`` (default): cache-resident pyarrow/pandas kernels — the
  CPU ceiling.
- ``memory``: fresh 64 MiB allocations, page-fault every page in,
  stream once — the plasma/tmpfs/first-touch shape every data
  pipeline actually pays.  On this box compute scales ~3.96x from
  4→16 workers (ceiling 0.99) while fresh-page memory traffic scales
  ~2.86x (ceiling 0.715): a string-heavy pipeline is bounded by the
  second number on a single node, and by neither across cluster NODES
  (each node brings its own memory controllers — the regime the
  north-rule scaling criterion describes).

Usage: python tools/capacity_probe.py [K] [quantum_items] [mode]
Prints one JSON line {"k_lo":…, "k_hi":…, "agg_lo":…, "agg_hi":…,
"capacity_ratio":…, "ceiling":…}.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _burn_memory(n_bytes: int, out):
    import numpy as np

    t0 = time.perf_counter()
    done = 0
    while done < n_bytes:
        a = np.empty(64 * 1024 * 1024, dtype=np.uint8)
        a[::4096] = 1   # fault every page in (fresh first-touch)
        a.sum()         # stream it once
        done += a.nbytes
        del a
    out.put(done / (time.perf_counter() - t0))


def _burn(n_items: int, out):
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pandas as pd

    rng = np.random.RandomState(0)
    words = np.array(["alpha", "beta", "gamma", "delta", "epsilon",
                      "zeta", "eta", "theta"], dtype=object)
    texts = pd.Series(rng.choice(words, size=4096)).str.cat(
        pd.Series(rng.choice(words, size=4096)), sep=" ")
    arr = pa.array(texts)
    t0 = time.perf_counter()
    done = 0
    while done < n_items:
        up = pc.utf8_upper(arr)
        pc.split_pattern(up, " ")
        pd.util.hash_pandas_object(texts, index=False)
        done += len(arr)
    out.put(done / (time.perf_counter() - t0))


def aggregate(k: int, quantum: int, mode: str) -> float:
    fn = _burn_memory if mode == "memory" else _burn
    q = mp.Queue()
    procs = [mp.Process(target=fn, args=(quantum, q)) for _ in range(k)]
    for p in procs:
        p.start()
    rates = [q.get() for _ in procs]
    for p in procs:
        p.join()
    return sum(rates)


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    mode = sys.argv[3] if len(sys.argv) > 3 else "compute"
    default_q = 2 * 1024 ** 3 if mode == "memory" else 3_000_000
    quantum = int(sys.argv[2]) if len(sys.argv) > 2 else default_q
    lo = aggregate(k, quantum, mode)
    hi = aggregate(4 * k, quantum, mode)
    ratio = hi / lo
    print(json.dumps({
        "mode": mode, "k_lo": k, "k_hi": 4 * k,
        "agg_lo": round(lo, 1), "agg_hi": round(hi, 1),
        "capacity_ratio": round(ratio, 3),
        "ceiling": round(ratio / 4, 3),
    }))


if __name__ == "__main__":
    main()
