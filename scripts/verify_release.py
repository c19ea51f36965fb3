"""One-command release drill (`make verify-release`).

Runs every gate the project ships behind, in order, each in its own
subprocess (the stages need different JAX platforms), logging to
``artifacts/release/<stage>.log`` and summarizing to
``artifacts/release/summary.json``:

  tests         full test tier (``pytest tests/ -q``) on the 8-device
                virtual CPU mesh — the release gate from the Makefile
  bench         flagship serving benchmark (bench.py, one JSON line) on the
                default platform (the real chip when tunneled)
  bench_suite   the 6-config serving suite (incl. opt-in int8) -> docs/BENCH_SUITE.md refresh
  dryrun        multi-chip SPMD dry-run: __graft_entry__.dryrun_multichip(8)
                on an 8-device virtual CPU mesh, cold-cache semantics left
                to the environment (the driver's own gate)
  convert_demo  conversion rehearsal at FULL scale: synthesize a
                module.-prefixed torch state_dict with the verbatim released
                V2-ViT-L/14 key inventory (520 keys,
                tests/fixtures/reference_state_dict_keys.json), run
                scripts/convert.py --verify (torch bin -> orbax -> torch-free
                from_pretrained -> demo-asset ARel path)

Every stage runs even if an earlier one fails; the exit code is nonzero if
any failed. Select stages with ``--stages tests,bench`` to iterate on one.

This is the command round 5 runs before calling the project COMPLETE.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
ART = ROOT / "artifacts" / "release"


def run_stage(name: str, cmd: list[str], env: dict | None = None, timeout: int = 7200):
    log = ART / f"{name}.log"
    t0 = time.time()
    print(f"[verify-release] {name}: {' '.join(cmd)}")
    full_env = dict(os.environ)
    if env:
        full_env.update(env)
    with log.open("w") as fh:
        try:
            rc = subprocess.run(
                cmd, cwd=ROOT, env=full_env, stdout=fh, stderr=subprocess.STDOUT,
                timeout=timeout,
            ).returncode
        except subprocess.TimeoutExpired:
            rc = -9
            fh.write(f"\n[verify-release] TIMEOUT after {timeout}s\n")
    dt = time.time() - t0
    tail = "".join(log.read_text().splitlines(keepends=True)[-3:])
    status = "OK" if rc == 0 else f"FAIL rc={rc}"
    print(f"[verify-release] {name}: {status} in {dt:.0f}s\n{tail}")
    return {"stage": name, "rc": rc, "seconds": round(dt, 1), "log": str(log)}


def synth_vitl14_checkpoint(out_dir: Path) -> Path:
    """Full-scale synthetic V2-ViT-L/14 torch checkpoint with the released
    key inventory and the `module.` training prefix."""
    import numpy as np
    import torch

    keys = json.loads(
        (ROOT / "tests/fixtures/reference_state_dict_keys.json").read_text()
    )["config_v2_vitl14"]
    rng = np.random.default_rng(0)
    sd = {
        "module." + k: torch.from_numpy(
            (rng.standard_normal(shape) * 0.02).astype(np.float32)
        )
        for k, shape in keys.items()
    }
    out_dir.mkdir(parents=True, exist_ok=True)
    p = out_dir / "pytorch_model.bin"
    torch.save(sd, p)
    return p


STAGES = ["tests", "bench", "bench_suite", "dryrun", "convert_demo"]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default=",".join(STAGES))
    ap.add_argument(
        "--convert-platform",
        default=None,
        help="force jax platform for the convert_demo stage (e.g. cpu)",
    )
    args = ap.parse_args(argv)
    want = [s.strip() for s in args.stages.split(",") if s.strip()]
    unknown = set(want) - set(STAGES)
    if unknown:
        ap.error(f"unknown stages {sorted(unknown)}; known: {STAGES}")

    ART.mkdir(parents=True, exist_ok=True)
    py = sys.executable
    results = []

    if "tests" in want:
        results.append(run_stage("tests", [py, "-m", "pytest", "tests/", "-q"]))
    if "bench" in want:
        results.append(run_stage("bench", [py, "bench.py"], timeout=1800))
    if "bench_suite" in want:
        results.append(
            run_stage(
                "bench_suite",
                [py, "scripts/bench_suite.py", "--update-doc"],
                timeout=3600,
            )
        )
    if "dryrun" in want:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            flags = (flags + " --xla_force_host_platform_device_count=8").strip()
        results.append(
            run_stage(
                "dryrun",
                [py, "-c", "import __graft_entry__ as g; g.dryrun_multichip(8)"],
                env={"JAX_PLATFORMS": "cpu", "XLA_FLAGS": flags},
                timeout=3600,
            )
        )
    if "convert_demo" in want:
        ckpt = synth_vitl14_checkpoint(ART / "synth_v2_vitl14")
        cmd = [
            py, "scripts/convert.py",
            "--input", str(ckpt),
            "--config", str(ROOT / "configs/config_v2_vitl14.json"),
            "--output", str(ART / "v2_vitl14_native"),
            "--verify",
        ]
        if args.convert_platform:
            cmd += ["--platform", args.convert_platform]
        results.append(run_stage("convert_demo", cmd, timeout=3600))

    summary = {
        "ok": all(r["rc"] == 0 for r in results),
        "stages": results,
        "completed": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    (ART / "summary.json").write_text(json.dumps(summary, indent=1) + "\n")
    print(json.dumps(summary))
    return 0 if summary["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
