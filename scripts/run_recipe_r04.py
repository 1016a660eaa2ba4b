"""Run the COMPLETE reference recipe on chip and record it (VERDICT r3 #3).

The reference recipe (/root/reference/config/SiT/training/hparams.yml:16-61,
driver /root/reference/tools/train.py:271-435): SiT-tiny, scan_age template,
sub-ico-2, SGD momentum 0.9, LR 1e-5, bs 256, 100 epochs, val every 10,
best-val checkpointing, then the test driver on the saved checkpoint.

Data: synthetic at exact dHCP scale (423 train / 53 val subjects, x2
hemisphere-samples -> 846 / 106 rows, (N, 4, 320, 153) pre-patched arrays,
z-scored channels) with a planted linear age signal so val MAE genuinely
converges — real dHCP cannot ship here, scale and shapes can.

Runs the shipped configs/training/sit_tiny_scan_age.yml EXACTLY as a user
would (run_training -> run_testing on the best checkpoint), once in bf16
(shipped default) and once in fp32 (parity reference), and writes
RECIPE_r04.json with both end states.

Run: python scripts/run_recipe_r04.py
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

import numpy as np
import yaml

REPO = Path("/root/repo")
WORK = Path("/tmp/recipe_r04")
N_TRAIN_SUBJ, N_VAL_SUBJ = 423, 53  # labels/dHCP/scan_age/{train,validation}.csv


def synth_split(rng, n_subjects, pattern):
    """(2N, 4, 320, 153) hemisphere-duplicated samples + scan-age labels
    (weeks), z-scored data carrying a linear age signal along ``pattern``."""
    ages = rng.uniform(26.0, 45.0, size=n_subjects).astype(np.float32)
    labels = np.concatenate([ages, ages])  # L then R rows, reference order
    n = 2 * n_subjects
    data = rng.standard_normal((n, 4, 320, 153)).astype(np.float32)
    z = (labels - 36.0) / 6.0
    data += z[:, None, None, None] * pattern[None]
    return data, labels


def make_data():
    rng = np.random.default_rng(0)
    pattern = (rng.standard_normal((4, 320, 153)) * 0.5).astype(np.float32)
    d = WORK / "scan_age" / "template"
    d.mkdir(parents=True, exist_ok=True)
    for split, n in (("train", N_TRAIN_SUBJ), ("validation", N_VAL_SUBJ)):
        data, labels = synth_split(rng, n, pattern)
        np.save(d / f"{split}_data.npy", data)
        np.save(d / f"{split}_labels.npy", labels)
    print(f"data: {d} (train {2*N_TRAIN_SUBJ}, val {2*N_VAL_SUBJ})",
          flush=True)


def one_run(tag: str, compute_dtype: str) -> dict:
    from surface_vision_transformers_tpu.train import runner
    from surface_vision_transformers_tpu.utils.config import from_dict

    raw = yaml.safe_load(
        (REPO / "configs/training/sit_tiny_scan_age.yml").read_text()
    )
    raw["data"]["data_path"] = str(WORK / "{}" / "{}")
    raw["logging"]["folder_to_save_model"] = str(WORK / f"logs_{tag}")
    raw.setdefault("tpu", {})["compute_dtype"] = compute_dtype
    exp = from_dict(raw)

    t0 = time.time()
    results = runner.run_training(exp, progress=True)
    wall = time.time() - t0
    print(f"[{tag}] train done in {wall:.1f}s: {results}", flush=True)

    # the reference user then points tools/testing.py at the checkpoint
    test_raw = dict(raw)
    test_raw["data"] = dict(raw["data"], split="validation")
    test_raw["weights"] = dict(raw.get("weights", {}))
    test_raw["testing"] = {"path_to_ckpt": str(results["run_dir"])}
    t_exp = from_dict(test_raw)
    t1 = time.time()
    test = runner.run_testing(t_exp)
    print(f"[{tag}] test driver: {test} ({time.time()-t1:.1f}s)", flush=True)

    return {
        "compute_dtype": compute_dtype,
        "best_val_mae": float(results["best_mae"]),
        "best_epoch": int(results["best_epoch"]),
        "epochs": 100,
        "train_wall_s": round(wall, 1),
        "run_dir": str(results["run_dir"]),
        "test_driver_mae": float(test["mae"]),
        "test_n": int(test["n"]),
    }


def main():
    import jax

    assert jax.default_backend() == "tpu", jax.default_backend()
    make_data()
    out = {
        "recipe": "configs/training/sit_tiny_scan_age.yml (reference "
                  "hparams.yml:16-61 equivalent): 100 epochs, bs 256, "
                  "SGD m=0.9 LR 1e-5, val every 10, best-ckpt, test driver",
        "data": f"synthetic dHCP-scale ({2*N_TRAIN_SUBJ} train / "
                f"{2*N_VAL_SUBJ} val surfaces, planted linear age signal)",
    }
    out["bf16"] = one_run("bf16", "bfloat16")
    out["fp32"] = one_run("fp32", "float32")
    out["bf16_vs_fp32_val_mae_delta"] = round(
        abs(out["bf16"]["best_val_mae"] - out["fp32"]["best_val_mae"]), 5
    )
    path = REPO / "RECIPE_r04.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out, indent=2), flush=True)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
