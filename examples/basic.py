"""Basic sslap_tpu usage: dense and sparse solves, feasibility, modes.

Run:  python examples/basic.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sslap_tpu import InfeasibleError, auction_solve, hopcroft_solve  # noqa: E402


def main():
    # --- dense: negative entries are forbidden assignments -----------------
    C = np.array([[3.0, 1.0, -1.0],
                  [2.0, -1.0, 5.0],
                  [-1.0, 4.0, 2.0]])
    res = auction_solve(C)                       # minimize by default
    print("dense min:", res["sol"], "objective:", res["meta"]["obj"])

    res = auction_solve(C, problem="max")
    print("dense max:", res["sol"], "objective:", res["meta"]["obj"])

    # --- sparse COO --------------------------------------------------------
    rng = np.random.default_rng(0)
    n = 500
    # random sparse costs + a planted perfect matching for feasibility
    rows = np.repeat(np.arange(n), 6)
    cols = rng.integers(0, n, rows.shape[0])
    rr = np.concatenate([rows, np.arange(n)])
    cc = np.concatenate([cols, rng.permutation(n)])
    key = rr.astype(np.int64) * n + cc
    _, idx = np.unique(key, return_index=True)
    loc = np.stack([rr[idx], cc[idx]], axis=1)
    val = rng.integers(1, 1000, loc.shape[0])

    res = auction_solve(loc=loc, val=val, shape=(n, n))
    print(f"sparse {n}x{n}: objective {res['meta']['obj']} "
          f"in {res['meta']['time']:.3f}s (mode {res['meta'].get('mode')})")

    # --- standalone Hopcroft-Karp maximum matching (structure only) --------
    match = hopcroft_solve(loc=loc, shape=(n, n))
    print("max matching size:", int((match >= 0).sum()), "/", n)

    # --- infeasibility is detected, not hung -------------------------------
    bad = np.array([[5.0, -1.0],
                    [7.0, -1.0]])                # both rows need column 0
    try:
        auction_solve(bad)
    except InfeasibleError as e:
        print("infeasible detected:", str(e).split("(")[0].strip())


if __name__ == "__main__":
    main()
