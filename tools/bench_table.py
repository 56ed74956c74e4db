#!/usr/bin/env python
"""Committed benchmark-table artifact (round-4 verdict #9).

Reference analog: `yolo benchmark` / utils/benchmarks.py:50-179 — a
format x (mAP50-95, ms) table proving every non-gated export format
round-trips through AutoBackend with the same accuracy as the native
model. Trains a quick yolo11n on the synthetic detect set so the mAP
column is a real consistency signal (random-init would compare 0 to 0),
then runs model.benchmark() over every format.

Usage: [JAX_PLATFORMS=cpu] python tools/bench_table.py [epochs] [out.md]
"""
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    out_md = Path(sys.argv[2]) if len(sys.argv) > 2 else REPO / "runs" / "benchmark_table.md"
    out_md.parent.mkdir(parents=True, exist_ok=True)

    import jax

    from edgeyolo_tpu import YOLO
    from edgeyolo_tpu.data.synthetic import generate_dataset

    work = out_md.parent / "bench_table_work"
    data = generate_dataset(work / "data", n_train=32, n_val=32, imgsz=320, nc=4,
                            min_objs=2, max_objs=6, min_size=0.1, max_size=0.3,
                            seed=3, task="detect")
    m = YOLO("yolo11n.yaml")
    t0 = time.time()
    m.train(data=str(data), epochs=epochs, imgsz=320, batch=16, amp=False,
            val=False, plots=False, cache="ram", workers=0, seed=0,
            project=str(work), name="train", exist_ok=True, patience=epochs)
    t_train = time.time() - t0
    rows = m.benchmark(imgsz=320, batch=8, iters=10, data=str(data),
                       out_dir=work / "export")

    platform = jax.devices()[0].platform
    lines = [
        "# Benchmark table — format x (latency, mAP50-95) via model.benchmark()",
        "",
        f"yolo11n trained {epochs} epochs on the synthetic detect set "
        f"(32 val images, nc=4, 320px); every row reloads the exported "
        f"artifact through AutoBackend and re-vals it. Backend platform: "
        f"**{platform}**" + (
            " — latency columns are CPU numbers (TPU held by the parity "
            "chain); the mAP column is the format-consistency signal."
            if platform == "cpu" else "."),
        "",
        "| format | status | ms/img | imgs/s | mAP50-95 |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['format']} | {r['status']} | {r.get('ms/img', '—')} | "
            f"{r.get('imgs/s', '—')} | {r.get('mAP50-95', '—')} |")
    native = next((r for r in rows if r["format"] == "native"), {})
    ok = [r for r in rows if r.get("status") == "ok" and isinstance(r.get("mAP50-95"), float)]
    if native.get("status") == "ok" and isinstance(native.get("mAP50-95"), float) and ok:
        worst = max(abs(r["mAP50-95"] - native["mAP50-95"]) for r in ok)
        lines += ["", f"Worst |mAP - native| across ok formats: **{worst:.4f}** "
                      f"(native {native['mAP50-95']}); train took {t_train:.0f}s."]
    out_md.write_text("\n".join(lines) + "\n")
    print("\n".join(lines))
    (out_md.with_suffix(".json")).write_text(json.dumps(rows, indent=1, default=str))


if __name__ == "__main__":
    main()
