"""Round-5 recipe record: full reference recipe on chip + phase breakdown
+ absolute torch anchor (VERDICT r4 #3 and #5).

Same synthetic dHCP-scale dataset as round 4 (423/53 subjects x2
hemispheres, planted linear age signal, identical seeds), run through the
product CLI path (run_training -> run_testing) in bf16 and fp32 for 100
epochs — now with the runner's per-phase wall-time breakdown — plus a
pinned 25-epoch run in both THIS framework and the reference-semantics
PyTorch driver (scripts/torch_recipe_anchor.py) so "parity" is anchored to
the reference, not to self-consistency.

Run order (chip):   python scripts/run_recipe_r05.py data    # write dataset
                    python scripts/torch_recipe_anchor.py 25 &   # CPU, bg
                    python scripts/run_recipe_r05.py jax     # chip runs
                    python scripts/run_recipe_r05.py merge   # RECIPE_r05.json
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

import numpy as np
import yaml

REPO = Path("/root/repo")
WORK = Path("/tmp/recipe_r05")
N_TRAIN_SUBJ, N_VAL_SUBJ = 423, 53  # labels/dHCP/scan_age/{train,validation}.csv
# pinned comparison horizon vs the eager-PyTorch anchor: the torch driver
# runs ~3 min/epoch on this host's single CPU core, so the anchored run is
# shorter than the full recipe (identical in both frameworks)
PIN_EPOCHS = 10


def synth_split(rng, n_subjects, pattern):
    """(2N, 4, 320, 153) hemisphere-duplicated samples + scan-age labels
    (weeks), z-scored data carrying a linear age signal along ``pattern``
    (identical construction and seeds to round 4's record)."""
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


def one_run(tag: str, compute_dtype: str, epochs=None) -> dict:
    from surface_vision_transformers_tpu.train import runner
    from surface_vision_transformers_tpu.utils.config import from_dict

    raw = yaml.safe_load(
        (REPO / "configs/training/sit_tiny_scan_age.yml").read_text()
    )
    raw["data"]["data_path"] = str(WORK / "{}" / "{}")
    raw["logging"]["folder_to_save_model"] = str(WORK / f"logs_{tag}")
    raw.setdefault("tpu", {})["compute_dtype"] = compute_dtype
    if epochs is not None:
        raw["training"]["epochs"] = epochs
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
        "epochs": int(results["epochs"]),
        "train_wall_s": round(wall, 1),
        "phases_s": results.get("phases_s"),
        "run_dir": str(results["run_dir"]),
        "test_driver_mae": float(test["mae"]),
        "test_n": int(test["n"]),
    }


def run_jax():
    import jax

    assert jax.default_backend() == "tpu", jax.default_backend()
    out = {}
    out["bf16"] = one_run("bf16", "bfloat16")
    out["fp32"] = one_run("fp32", "float32")
    out["bf16_pin"] = one_run("bf16_pin", "bfloat16", epochs=PIN_EPOCHS)
    (WORK / "jax_runs.json").write_text(json.dumps(out, indent=2))
    print("wrote", WORK / "jax_runs.json", flush=True)


def merge():
    jx = json.loads((WORK / "jax_runs.json").read_text())
    out = {
        "recipe": "configs/training/sit_tiny_scan_age.yml (reference "
                  "hparams.yml:16-61 equivalent): 100 epochs, bs 256, "
                  "SGD m=0.9 LR 1e-5, val every 10, best-ckpt, test driver",
        "data": f"synthetic dHCP-scale ({2*N_TRAIN_SUBJ} train / "
                f"{2*N_VAL_SUBJ} val surfaces, planted linear age signal, "
                "seeds identical to RECIPE_r04)",
        **jx,
    }
    out["bf16_vs_fp32_val_mae_delta"] = round(
        abs(jx["bf16"]["best_val_mae"] - jx["fp32"]["best_val_mae"]), 5
    )
    out["test_driver_vs_train_val"] = {
        k: round(abs(jx[k]["test_driver_mae"] - jx[k]["best_val_mae"]), 6)
        for k in ("bf16", "fp32")
    }
    ta = WORK / "torch_anchor.json"
    if ta.exists():
        anchor = json.loads(ta.read_text())
        out["torch_anchor"] = anchor
        assert anchor["epochs"] == jx["bf16_pin"]["epochs"]
        out["jax_vs_torch_pinned_horizon"] = {
            "epochs": anchor["epochs"],
            "jax_bf16_val_mae": jx["bf16_pin"]["best_val_mae"],
            "torch_fp32_val_mae": anchor["best_val_mae"],
            "abs_delta": round(abs(jx["bf16_pin"]["best_val_mae"]
                                   - anchor["best_val_mae"]), 5),
        }
    path = REPO / "RECIPE_r05.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out, indent=2), flush=True)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode in ("data", "all"):
        make_data()
    if mode in ("jax", "all"):
        run_jax()
    if mode in ("merge", "all"):
        merge()
