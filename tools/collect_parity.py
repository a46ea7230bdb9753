#!/usr/bin/env python3
"""Run tools/recon_parity.py and commit its stage lines as a single
dated JSON artifact (PARITY_r{N}.json) with full provenance — the
per-round reproducible quality capture (VERDICT r3 ask #5)."""
import json
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]


def main():
    out_name = sys.argv[1] if len(sys.argv) > 1 else "PARITY_r04.json"
    extra = sys.argv[2:]
    cmd = [sys.executable, "-u", str(REPO / "tools" / "recon_parity.py"),
           *extra]
    t0 = time.time()
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
    lines = []
    for ln in r.stdout.splitlines():
        try:
            lines.append(json.loads(ln))
        except json.JSONDecodeError:
            continue
    git = subprocess.run(["git", "rev-parse", "HEAD"], cwd=REPO,
                         capture_output=True, text=True).stdout.strip()
    artifact = {
        "generated_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                       time.gmtime()),
        "git_head": git,
        "command": " ".join(cmd[1:]),
        "wall_s": round(time.time() - t0, 1),
        "rc": r.returncode,
        "stages": lines,
        "stderr_tail": r.stderr[-1500:] if r.returncode else "",
        "protocol": "tools/recon_parity.py: 60-frame synthetic urban "
                    "canyon @ KITTI geometry (64x1024), mapping-GT "
                    "(keyframe every 5 frames), evaluate_recon per ref "
                    "utils/eval_utils.py:67-154 (2 cm voxel, 0.2 m "
                    "F-threshold, 0.5 m truncation) against BOTH the "
                    "observed-world and full-world references, for BOTH "
                    "meshers (TSDF + grid Poisson).",
    }
    (REPO / out_name).write_text(json.dumps(artifact, indent=1))
    print(f"wrote {out_name} rc={r.returncode} stages={len(lines)}")
    for ln in lines:
        if str(ln.get("stage", "")).startswith("eval_recon"):
            print(json.dumps(ln))


if __name__ == "__main__":
    main()
