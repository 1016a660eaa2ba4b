"""End-to-end run workflows: the capability layer over Trainer.

Covers everything the reference's three driver scripts do — supervised
training with periodic validation and best-val checkpointing + predictions CSV
+ self-documenting config dump (reference: tools/train.py:271-435), MPP
pretraining with encoder / encoder+decoder best checkpoints (reference:
tools/pretrain.py:303-418), and batched test inference with results.csv
(reference: tools/testing.py:21-101) — as one parameterized workflow, plus
capabilities the reference lacks: exact resume from checkpoint, JSONL/CSV
metrics, and optional profiler traces.
"""

from __future__ import annotations

import math
import os
import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from surface_vision_transformers_tpu.checkpoints import orbax_io
from surface_vision_transformers_tpu.checkpoints.torch_import import (
    merge_params,
    mpp_params_from_torch,
    sit_params_from_torch,
)
from surface_vision_transformers_tpu.data import npy as npy_io
from surface_vision_transformers_tpu.geometry import load_patch_table
from surface_vision_transformers_tpu.obs.logging import (
    MetricLogger,
    run_folder_name,
)
from surface_vision_transformers_tpu.train.trainer import Trainer, TrainState
from surface_vision_transformers_tpu.utils.config import (
    Experiment,
    dump_config_with_results,
)


def _resolve_mesh(exp: Experiment, mesh):
    """The product-path mesh: explicit argument wins, else built from the
    ``tpu.mesh_{data,fsdp,model}`` config keys over all visible devices
    (every process's, when multi-host). None means single-device."""
    if mesh is not None:
        return mesh
    from surface_vision_transformers_tpu.parallel import mesh_from_config

    return mesh_from_config(exp.tpu)


def _mesh_context(mesh):
    """Context for sharded runs: ``jax.set_mesh`` so in-model
    ``with_sharding_constraint(PartitionSpec)`` annotations (sequence
    sharding) resolve axis names."""
    import contextlib

    return jax.set_mesh(mesh) if mesh is not None else contextlib.nullcontext()


def _shard_state(state, mesh):
    if mesh is None:
        return state
    from surface_vision_transformers_tpu.parallel import shard_state

    return shard_state(state, mesh)


def _write_preds_csv(path, preds, targets) -> None:
    import csv

    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["pred", "target"])
        for p, t in zip(np.asarray(preds).ravel(), np.asarray(targets).ravel()):
            w.writerow([float(p), float(t)])


def load_datasets(exp: Experiment, splits=None) -> dict:
    """Load reference-format .npy splits from the configured data path. With
    ``training.testing: True`` the test split loads too, so the end-of-run
    test (reference tools/train.py:378-435) actually has data.

    With ``data.streaming`` 'on' or 'auto' the arrays come back as read-only
    np.memmap views (zero host RAM until batches are sliced); 'off' keeps the
    eager float32 load."""
    path = exp.data.resolved_data_path()
    if splits is None:
        splits = ("train", "validation")
        if exp.training.testing:
            splits = splits + ("test",)
    out = {}
    for split in splits:
        data, labels = npy_io.load_split(
            path, split, mmap=exp.data.streaming != "off"
        )
        out[split] = (data, labels)
    return out


def _use_streaming(exp: Experiment, train_data) -> bool:
    """Product-path streaming decision: 'on'/'off' are explicit; 'auto'
    streams when the device-resident epoch needs more than
    ``data.streaming_budget_gb`` of HBM — the on-device scan keeps the
    dataset PLUS a whole-epoch permuted copy resident (2x; see
    trainer._build_epoch_fn)."""
    mode = exp.data.streaming
    if mode == "on":
        return True
    if mode == "off":
        return False
    bytes_f32 = int(np.prod(np.shape(train_data))) * 4
    return 2 * bytes_f32 > exp.data.streaming_budget_gb * 2**30


def _device_put(exp: Experiment, arr: np.ndarray, mesh=None):
    """Batch arrays onto the device(s): plain transfer single-device, batch-
    sharded under a mesh, assembled from per-process local rows multi-host."""
    if mesh is None:
        return jnp.asarray(arr)
    from surface_vision_transformers_tpu.parallel import local_batch_to_global
    from surface_vision_transformers_tpu.parallel.multihost import (
        process_local_slice,
    )

    arr = np.asarray(arr)
    n_global = arr.shape[0]
    n_shards = mesh.shape["data"] * mesh.shape["fsdp"]
    if n_global % n_shards:
        # dataset rows don't divide the data axes: keep the (small) dataset
        # replicated; the per-step BATCH still shards via the trainer's
        # with_sharding_constraint, so compute stays fully data-parallel
        from jax.sharding import NamedSharding, PartitionSpec

        return jax.device_put(arr, NamedSharding(mesh, PartitionSpec()))
    if jax.process_count() > 1:
        start, stop = process_local_slice(n_global)
        arr = arr[start:stop]
    return local_batch_to_global(arr, mesh, n_global)


def _device_copy(tree):
    """On-device defensive copy of a state pytree (~1 ms, one dispatch) —
    the live state is donated into the next epoch's step, so a plain
    reference would be invalidated."""
    return jax.jit(lambda t: jax.tree.map(jnp.copy, t))(tree)


def _write_best(run_dir: Path, state, meta: dict, trainer: Trainer,
                is_mpp: bool) -> None:
    """The best-val checkpoint set: full state + portable params npz (+
    encoder-only npz for SSL handoff, reference tools/pretrain.py:378-389)."""
    orbax_io.save_state(run_dir / "best", state, meta)
    best_p = trainer.eval_params(state)
    orbax_io.save_params_npz(run_dir / "best_params.npz", {"params": best_p})
    if is_mpp:
        orbax_io.save_params_npz(
            run_dir / "encoder_best_params.npz", {"params": best_p["encoder"]}
        )


def _load_initial_weights(exp: Experiment, trainer: Trainer, state: TrainState):
    """SSL / ImageNet initialization (reference tools/train.py:213-223)."""
    params = state.params
    if exp.training.load_weights_ssl and exp.ssl_weights_path not in ("", ".."):
        loaded = _load_params_any(exp.ssl_weights_path, exp.model.depth)
        if trainer.task == "mpp" and "patch_embedding_kernel" in loaded:
            # a plain SiT tree (its own 'encoder' key is the transformer
            # stack) initializes the MPP's nested encoder
            loaded = {"encoder": loaded}
        n_before = _count_shared_leaves(params, loaded)
        if n_before == 0:
            raise ValueError(
                f"SSL checkpoint {exp.ssl_weights_path!r} shares no parameter "
                "with the model (wrong depth/format?)"
            )
        params = merge_params(params, loaded)
        state = trainer.load_params(state, params)
    if exp.training.load_weights_imagenet and exp.imagenet_weights:
        # expects a local torch/timm state-dict file (no network egress)
        from surface_vision_transformers_tpu.checkpoints.torch_import import (
            imagenet_params_from_timm,
            load_torch_state_dict,
        )

        timm_state = load_torch_state_dict(exp.imagenet_weights)
        params = imagenet_params_from_timm(
            jax.tree.map(np.asarray, params), timm_state, exp.model.depth
        )
        state = trainer.load_params(state, jax.tree.map(jnp.asarray, params))
    return state


def _count_shared_leaves(base: dict, loaded: dict) -> int:
    n = 0
    for k, v in base.items():
        if k in loaded:
            if isinstance(v, dict) and isinstance(loaded[k], dict):
                n += _count_shared_leaves(v, loaded[k])
            elif not isinstance(v, dict):
                n += 1
    return n


def _load_params_any(path: str, depth: int) -> dict:
    """Load params from orbax dir / npz / torch .pt(.pth), auto-detected."""
    p = Path(path)
    if p.is_dir():
        raise ValueError(
            "orbax checkpoint restore needs a state template; use "
            "runner.resume() or pass an npz/pt file"
        )
    if p.suffix == ".npz":
        tree = orbax_io.load_params_npz(p)
        return tree.get("params", tree)
    state = None
    from surface_vision_transformers_tpu.checkpoints.torch_import import (
        load_torch_state_dict,
    )

    state = load_torch_state_dict(str(p))
    if any(k.startswith("transformer.transformer") or k == "mask_token" for k in state):
        return mpp_params_from_torch(state, depth)["encoder"]
    if any(k.startswith("transformer.") for k in state):
        # reference MPP encoder-only dict is a plain SiT state dict
        return sit_params_from_torch(state, depth, strict=False)
    return sit_params_from_torch(state, depth, strict=False)


def run_training(
    exp: Experiment,
    *,
    datasets: Optional[dict] = None,
    run_root: Optional[str] = None,
    mesh=None,
    progress: bool = True,
    resume_from: Optional[str] = None,
) -> dict:
    """Supervised or MPP training per the config. Returns a results dict
    (best metric, epochs, run_dir...).

    This is the public entry-point contract (reference tools/train.py:443-459
    / tools/pretrain.py): multi-chip runs need nothing beyond the YAML —
    ``tpu.mesh_{data,fsdp,model}`` builds the mesh, parameters/optimizer
    state shard per the TP/FSDP rules, batches shard over the data axes.

    ``resume_from``: an existing run directory — training continues IN that
    directory from its latest checkpoint (``last`` > ``final`` > ``best``),
    with the epoch counter and best-so-far restored (no reference
    equivalent; its interrupted runs start over)."""
    mesh = _resolve_mesh(exp, mesh)
    with _mesh_context(mesh):
        return _run_training_inner(
            exp, datasets=datasets, run_root=run_root, mesh=mesh,
            progress=progress, resume_from=resume_from,
        )


def _run_training_inner(
    exp: Experiment,
    *,
    datasets: Optional[dict],
    run_root: Optional[str],
    mesh,
    progress: bool,
    resume_from: Optional[str] = None,
) -> dict:
    from surface_vision_transformers_tpu.utils.env import enable_compilation_cache

    enable_compilation_cache()
    if exp.tpu.debug_nans:
        jax.config.update("jax_debug_nans", True)
    t_start = time.time()
    # per-phase wall-time breakdown (recorded into the results dict and
    # hparams_results.yml): the product path must account for its time —
    # round 4 shipped a 20-60x bench-vs-recipe gap nobody could explain
    phases = {k: 0.0 for k in ("setup", "data_upload", "first_epoch",
                               "train", "val", "ckpt", "test")}
    datasets = datasets or load_datasets(exp)
    train_data, train_labels = datasets["train"]
    val_data, val_labels = datasets.get("validation", (None, None))
    for name, (d, l) in datasets.items():
        if l is not None and d.shape[0] != np.shape(l)[0]:
            raise ValueError(
                f"{name}: {d.shape[0]} samples vs {np.shape(l)[0]} labels"
            )

    if resume_from is not None:
        run_dir = Path(resume_from)
        if not run_dir.is_dir():
            raise FileNotFoundError(
                f"resume_from {run_dir} is not an existing run directory"
            )
    else:
        run_root = Path(run_root or exp.logging_folder)
        run_dir = run_root / run_folder_name(exp)
        run_dir.mkdir(parents=True, exist_ok=True)
    logger = MetricLogger(run_dir)

    table_obj = load_patch_table(exp.ico, exp.sub_ico)
    table = table_obj.indices
    augment = None
    if exp.augment.enabled:
        from surface_vision_transformers_tpu.data.augment import SurfaceAugment

        mesh_verts = mesh_faces = None
        if exp.augment.sphere_path:
            from surface_vision_transformers_tpu.data import gifti

            img = gifti.load(exp.augment.sphere_path)
            mesh_verts = np.asarray(img.darrays[0].data, np.float64)
            mesh_verts /= np.linalg.norm(mesh_verts, axis=1, keepdims=True)
            mesh_faces = np.asarray(img.darrays[1].data, np.int64)
        elif table_obj.ordering != "canonical":
            raise ValueError(
                "augmentation with an atlas-ordered patch table (e.g. the "
                "shipped dHCP tables) needs the matching sphere coordinates: "
                "set augmentation.sphere_path to the atlas sphere .surf.gii "
                "(for dHCP data that's the ico-6 sphere shipped with every "
                "dHCP download, e.g. "
                "week-40_hemi-left_space-dhcpSym_dens-ico6_sphere.surf.gii). "
                "The atlas numbering is not recoverable from the patch "
                "tables (see assets/README.md); rotation tables built from "
                "the canonical icosphere would scramble atlas-ordered data."
            )
        augment = SurfaceAugment(
            ico=exp.ico,
            patch_table=table,
            exact_rotations=exp.augment.exact_rotations,
            num_warps=exp.augment.num_warps,
            max_warp_deg=exp.augment.max_warp_deg,
            warp_prob=exp.augment.warp_prob,
            warp_per_batch=exp.augment.warp_per_batch,
            warp_assign=exp.augment.warp_assign,
            seed=exp.augment.seed,
            mesh_verts=mesh_verts,
            mesh_faces=mesh_faces,
        )
    if train_data.ndim != 3:  # pre-patched input -> no on-device patchify
        table = None
    trainer = Trainer(exp, mesh=mesh, patch_table=table, augment=augment)
    state = trainer.init_state(np.asarray(train_data[:1], np.float32))
    state = _load_initial_weights(exp, trainer, state)
    state = _shard_state(state, mesh)

    streaming = _use_streaming(exp, train_data)
    if streaming:
        # host-resident data (memmap-friendly): per-step jit with the
        # double-buffered H2D loader instead of the on-device epoch scan
        from surface_vision_transformers_tpu.data.pipeline import (
            StreamingLoader,
        )

        train_loader = StreamingLoader(
            train_data, train_labels, batch_size=exp.training.bs,
            shuffle=True, seed=exp.training.seed, mesh=mesh,
        )
        bs_val = exp.training.bs_val or exp.training.bs
        val_loader = (
            StreamingLoader(val_data, val_labels, batch_size=bs_val,
                            shuffle=False, mesh=mesh)
            if val_data is not None else None
        )
        d_train = l_train = d_val = l_val = None
    else:
        train_loader = val_loader = None
        t_up = time.time()
        d_train = _device_put(exp, train_data, mesh)
        l_train = _device_put(exp, train_labels, mesh) if train_labels is not None else None
        d_val = _device_put(exp, val_data, mesh) if val_data is not None else None
        l_val = _device_put(exp, val_labels, mesh) if val_labels is not None else None
        jax.block_until_ready(d_train)
        phases["data_upload"] = time.time() - t_up

    best = math.inf
    best_epoch = -1
    best_snapshot = None
    start_epoch = 0
    is_mpp = trainer.task == "mpp"
    metric_name = "loss" if is_mpp else "mae"

    if resume_from is not None:
        # pick the checkpoint with the HIGHEST recorded epoch — `last` is
        # usually newest but is older than `final` when ckpt_every doesn't
        # divide epochs (resuming from it would silently retrain the tail)
        candidates = []
        for name in ("last", "final", "best"):
            meta_file = run_dir / name / "metadata.json"
            if (run_dir / name).exists():
                meta = {}
                if meta_file.exists():
                    import json as _json

                    meta = _json.loads(meta_file.read_text())
                candidates.append((int(meta.get("epoch", -1)), name, meta))
        if not candidates:
            raise FileNotFoundError(
                f"no checkpoint (last/final/best) under {run_dir}"
            )
        epoch_at, name, meta = max(candidates, key=lambda c: c[0])
        state, _ = _restore_state_flex(run_dir / name, state, trainer)
        start_epoch = epoch_at + 1
        best = float(meta.get("best", meta.get(metric_name, math.inf)))
        if math.isnan(best):
            best = math.inf
        # `best`'s own epoch IS the best epoch (older metadata lacks the key)
        default_be = epoch_at if name == "best" else -1
        best_epoch = int(meta.get("best_epoch", default_be))
        if streaming and train_loader is not None:
            # align the shuffle stream so the continued trajectory sees the
            # permutations the uninterrupted run would have
            train_loader.set_epoch(start_epoch)
        if progress:
            print(
                f"resuming from {run_dir / name} at epoch "
                f"{start_epoch} (best {metric_name} {best:.5f})"
            )

    from surface_vision_transformers_tpu.obs.logging import profile_trace

    phases["setup"] = time.time() - t_start - phases["data_upload"]
    for epoch in range(start_epoch, exp.training.epochs):
        t_epoch = time.time()
        with profile_trace(run_dir / "profile",
                           enabled=(epoch == exp.tpu.profile_epoch)):
            if streaming:
                state, m = trainer.train_epoch_streaming(state, train_loader)
            else:
                state, m = trainer.train_epoch(state, d_train, l_train)
        dt_epoch = time.time() - t_epoch
        phases["first_epoch" if epoch == start_epoch else "train"] += dt_epoch
        if (
            epoch == start_epoch and progress
            and not exp.tpu.scan_blocks
            and time.time() - t_epoch > 60
        ):
            # first epoch is dominated by per-layer XLA/Mosaic compiles;
            # scan_blocks compiles the block stack once (355 s -> 17 s at
            # SiT-tiny bs=1024) for ~10% steady-state cost — worth
            # suggesting, not defaulting (docs/design.md)
            print(
                f"hint: first epoch took {time.time() - t_epoch:.0f}s, "
                "mostly compile; `tpu: {scan_blocks: true}` compiles the "
                "block stack once (~20x faster first epoch, ~10% slower "
                "steady state)"
            )
        if not math.isfinite(m.loss):
            raise FloatingPointError(
                f"non-finite training loss at epoch {epoch}: {m.loss} "
                f"(check data/labels and LR)"
            )
        logger.log(epoch, m.as_dict(), prefix="train/")
        if progress and (epoch % 5 == 0 or epoch == exp.training.epochs - 1):
            print(f"epoch {epoch}: train loss {m.loss:.5f} {metric_name} "
                  f"{getattr(m, metric_name):.5f}")

        run_val = (val_loader if streaming else d_val) is not None and (
            (epoch + 1) % exp.training.val_epoch == 0
            or epoch == exp.training.epochs - 1
        )
        if run_val:
            t_val = time.time()
            if streaming:
                vm, preds = trainer.evaluate_streaming(state, val_loader)
            else:
                vm, preds = trainer.evaluate(state, d_val, l_val)
            phases["val"] += time.time() - t_val
            logger.log(epoch, vm.as_dict(), prefix="val/")
            score = getattr(vm, metric_name)
            if progress:
                print(f"epoch {epoch}: val {metric_name} {score:.5f}")
            if score < best:
                best, best_epoch = score, epoch
                t_ck = time.time()
                if exp.training.save_ckpt:
                    best_meta = {"epoch": epoch, metric_name: float(score),
                                 "best": float(score), "best_epoch": epoch}
                    if exp.training.eager_best_ckpt:
                        # reference behaviour: files land on improvement
                        # (tools/train.py:361-363) — each save pays a full
                        # device->host state fetch through the relay
                        _write_best(run_dir, state, best_meta, trainer,
                                    is_mpp)
                        best_snapshot = None
                    else:
                        # default: snapshot on device, write once at the end
                        best_snapshot = (_device_copy(state), best_meta)
                if not is_mpp and preds is not None:
                    _write_preds_csv(run_dir / "preds.csv", preds, val_labels)
                phases["ckpt"] += time.time() - t_ck

        if (
            exp.training.ckpt_every
            and exp.training.save_ckpt
            and (epoch + 1) % exp.training.ckpt_every == 0
        ):
            # rolling preemption checkpoint; run_training(resume_from=...)
            # picks it up with the epoch counter and best-so-far intact
            t_ck = time.time()
            orbax_io.save_state(
                run_dir / "last", state,
                {"epoch": epoch, "best": float(best),
                 "best_epoch": int(best_epoch)},
            )
            phases["ckpt"] += time.time() - t_ck

    t_ck = time.time()
    if exp.training.save_ckpt and best_snapshot is not None:
        # deferred best-val checkpoint (see training.eager_best_ckpt)
        snap, best_meta = best_snapshot
        _write_best(run_dir, snap, best_meta, trainer, is_mpp)
    if exp.training.save_ckpt:
        # final state is always recoverable, validation split or not
        # (the reference's pretrain saves final ckpts too,
        # tools/pretrain.py:406-418; its train.py loses the run when val
        # never improves)
        orbax_io.save_state(
            run_dir / "final", state,
            {"epoch": exp.training.epochs - 1, metric_name: float(best),
             "best": float(best), "best_epoch": int(best_epoch)},
        )
        orbax_io.save_params_npz(
            run_dir / "final_params.npz", {"params": state.params}
        )
        if is_mpp:
            orbax_io.save_params_npz(
                run_dir / "encoder_final_params.npz",
                {"params": state.params["encoder"]},
            )
        if best_epoch < 0 and not (run_dir / "best").exists():
            # never write over a real best from an earlier (resumed) run
            orbax_io.save_state(
                run_dir / "best", state,
                {"epoch": exp.training.epochs - 1, metric_name: float("nan"),
                 "best_epoch": -1},
            )

    phases["ckpt"] += time.time() - t_ck
    results = {
        f"best_{metric_name}": float(best),
        "best_epoch": int(best_epoch),
        "epochs": int(exp.training.epochs),
        "run_dir": str(run_dir),
        "wall_s": round(time.time() - t_start, 2),
        "training_finished": True,
        "streaming": bool(streaming),
    }
    if mesh is not None:
        results["mesh"] = {k: int(v) for k, v in mesh.shape.items()}

    if exp.training.testing and "test" in datasets:
        # the reference tests the BEST checkpoint, not the final state
        # (tools/train.py:378-435 rebuilds the model and reloads best)
        t_test = time.time()
        test_state = state
        if exp.training.save_ckpt and best_epoch >= 0:
            test_state, _ = orbax_io.restore_state(run_dir / "best", state)
        test_data, test_labels = datasets["test"]
        if streaming:
            from surface_vision_transformers_tpu.data.pipeline import (
                StreamingLoader,
            )

            tm, preds = trainer.evaluate_streaming(
                test_state,
                StreamingLoader(
                    test_data, test_labels,
                    batch_size=exp.training.bs_val or exp.training.bs,
                    shuffle=False, mesh=mesh,
                ),
            )
        else:
            tm, preds = trainer.evaluate(
                test_state,
                _device_put(exp, test_data, mesh),
                _device_put(exp, test_labels, mesh),
            )
        if preds is not None:
            _write_preds_csv(run_dir / "test_preds.csv", preds, test_labels)
        results["test_mae" if not is_mpp else "test_loss"] = float(
            tm.mae if not is_mpp else tm.loss
        )
        phases["test"] = time.time() - t_test

    results["phases_s"] = {k: round(v, 2) for k, v in phases.items()}
    dump_config_with_results(exp, results, run_dir / "hparams_results.yml")
    logger.close()
    return results


def run_testing(
    exp: Experiment,
    *,
    datasets: Optional[dict] = None,
    params=None,
    mesh=None,
) -> dict:
    """Batched inference + metric + results.csv (reference tools/testing.py).
    Regression configs report MAE and write (pred, target) rows; MPP configs
    report the reconstruction loss (no per-sample predictions to export)."""
    if params is None and not exp.ckpt_path:
        # evaluating a fresh-init model is never what a user wants; the
        # reference's test driver hard-requires a checkpoint too
        # (reference tools/testing.py:68)
        raise ValueError(
            "run_testing needs weights: set testing.path_to_ckpt (a run "
            "dir, Orbax dir, .npz, or reference .pth) or pass params="
        )
    split = exp.data.split or "validation"
    datasets = datasets or load_datasets(exp, splits=(split,))
    data, labels = datasets[split]

    table = None
    if data.ndim == 3:
        table = load_patch_table(exp.ico, exp.sub_ico).indices
    mesh = _resolve_mesh(exp, mesh)
    with _mesh_context(mesh):
        trainer = Trainer(exp, mesh=mesh, patch_table=table)
        state = trainer.init_state(data[:1])
        if params is not None:
            state = trainer.load_params(state, params)
        elif exp.ckpt_path:
            ckpt = Path(exp.ckpt_path)
            if ckpt.is_dir() and (ckpt / "best").exists():
                state, _ = _restore_state_flex(ckpt / "best", state, trainer)
            elif ckpt.is_dir() and (ckpt / "state").exists():
                state, _ = _restore_state_flex(ckpt, state, trainer)
            else:
                loaded = _load_params_any(str(ckpt), exp.model.depth)
                state = trainer.load_params(
                    state,
                    merge_params(jax.tree.map(np.asarray, state.params), loaded),
                )
        state = _shard_state(state, mesh)

        if _use_streaming(exp, data):
            from surface_vision_transformers_tpu.data.pipeline import (
                StreamingLoader,
            )

            m, preds = trainer.evaluate_streaming(
                state,
                StreamingLoader(
                    data, labels,
                    batch_size=exp.training.bs_val or exp.training.bs,
                    shuffle=False, mesh=mesh,
                ),
            )
        else:
            m, preds = trainer.evaluate(
                state,
                _device_put(exp, data, mesh),
                _device_put(exp, labels, mesh) if labels is not None else None,
            )
    out_dir = Path(exp.ckpt_path) if exp.ckpt_path else Path(exp.logging_folder)
    if out_dir.is_file() or out_dir.suffix in (".npz", ".pt", ".pth"):
        out_dir = out_dir.parent
    out_dir.mkdir(parents=True, exist_ok=True)
    results = {"n": int(data.shape[0]), "split": split}
    if trainer.task == "mpp":
        results["loss"] = float(m.loss)
    else:
        _write_preds_csv(out_dir / "results.csv", preds, labels)
        results["mae"] = float(m.mae)
    return results


def _restore_state_flex(path, state: TrainState, trainer: Trainer):
    """restore_state tolerant of the EMA field: a checkpoint written with the
    opposite ``training.ema`` setting has a different TrainState structure
    (shadow present/absent), so on a structure mismatch retry with the other
    template and normalize via _ensure_ema."""
    try:
        return orbax_io.restore_state(path, state)
    except (ValueError, TypeError, KeyError):
        # orbax raises ValueError on tree-structure mismatch; anything else
        # (missing files, IO, dtype/shape explosions) propagates as-is so
        # the real failure isn't masked by a misleading second attempt
        if state.ema_params is None:
            alt = state.replace(
                ema_params=jax.tree_util.tree_map(jnp.array, state.params)
            )
        else:
            alt = state.replace(ema_params=None)
        restored, meta = orbax_io.restore_state(path, alt)
        return trainer._ensure_ema(restored), meta


def resume(
    exp: Experiment, run_dir: str, datasets: Optional[dict] = None, mesh=None
):
    """Exact resume from an orbax checkpoint (no reference equivalent —
    SURVEY §5 notes the reference saves optimizer state but never reads it).
    Mesh-aware: under a mesh (explicit or from ``tpu.mesh_*``) the template
    is sharded first, so orbax restores each leaf directly onto its
    TP/FSDP/replicated placement. The mesh is available as ``trainer.mesh``;
    continue training inside ``jax.set_mesh(trainer.mesh)``."""
    datasets = datasets or load_datasets(exp)
    train_data, _ = datasets["train"]
    table = None
    if train_data.ndim == 3:
        table = load_patch_table(exp.ico, exp.sub_ico).indices
    mesh = _resolve_mesh(exp, mesh)
    with _mesh_context(mesh):
        trainer = Trainer(exp, mesh=mesh, patch_table=table)
        state = trainer.init_state(train_data[:1])
        state = _shard_state(state, mesh)
        state, meta = _restore_state_flex(Path(run_dir) / "best", state, trainer)
    return trainer, state, meta
