"""Deep-component CC evidence: large-star/small-star vs min-label
propagation on path graphs (worst-case diameter).

Canonicalization at web scale is the deep-graph risk: sameAs chains
through shared aliases can form long paths, and min-label propagation
needs O(diameter) shuffle rounds. The star algorithm (Kiveris et al.)
needs O(log² n). This bench runs both on chains of increasing depth and
writes BENCH/CC.md.

Run: python tools/cc_bench.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from kgap_spark.canonicalize.connected_components import (
        connected_components,
        connected_components_star,
    )
    from kgap_spark.session import get_spark

    spark = get_spark("cc-bench", master="local[8]", shuffle_partitions=8)
    rows = []
    for depth in (256, 1024, 4096):
        edges = spark.createDataFrame(
            [(f"n{i:06d}", f"n{i+1:06d}") for i in range(depth - 1)],
            "src string, dst string",
        ).localCheckpoint(True)

        t0 = time.monotonic()
        star = connected_components_star(edges, num_partitions=8)
        n_comp_star = star.select("component").distinct().count()
        t_star = time.monotonic() - t0

        # label propagation capped at 25 rounds: diameter-bound, so on
        # deep chains it CANNOT converge — the point of the comparison
        t0 = time.monotonic()
        label = connected_components(edges, max_iter=25, num_partitions=8,
                                     strict=False)  # demonstrating the miss
        n_comp_label = label.select("component").distinct().count()
        t_label = time.monotonic() - t0

        rows.append((depth, t_star, n_comp_star, t_label, n_comp_label))
        print(f"depth {depth}: star {t_star:.1f}s ({n_comp_star} comp), "
              f"label@25 {t_label:.1f}s ({n_comp_label} comp)")
    spark.stop()

    lines = [
        "# BENCH/CC — deep-component canonicalization",
        "",
        "Path graphs (worst-case diameter = n−1). `star` = large-star/",
        "small-star (O(log² n) rounds); `label@25` = min-label propagation",
        "capped at 25 rounds (its per-round cost is one shuffle, so an",
        "uncapped run on a 4096-chain would need ~4095 shuffle rounds).",
        "A correct result has exactly **1** component.",
        "",
        "| depth | star wall (s) | star components | label@25 wall (s) | label@25 components |",
        "|---|---|---|---|---|",
    ]
    for d, ts, cs, tl, cl in rows:
        ok = "**1** ✓" if cs == 1 else f"{cs} ✗"
        lab = "1" if cl == 1 else f"**{cl}** (diameter-bound: not converged)"
        lines.append(f"| {d} | {ts:.1f} | {ok} | {tl:.1f} | {lab} |")
    lines += [
        "",
        "The production default (`canonical_mapping`) stays on label",
        "propagation — alias-sharing clusters are shallow near-cliques",
        "(2–3 rounds) — with `algorithm='star'` as the deep-chain path.",
        "",
        "Reproduce: `python tools/cc_bench.py`.",
    ]
    with open(os.path.join(REPO, "BENCH", "CC.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("BENCH/CC.md written")


if __name__ == "__main__":
    main()
