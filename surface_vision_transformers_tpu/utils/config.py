"""Typed experiment configuration over reference-compatible YAML.

The reference indexes raw ``yaml.safe_load`` dicts with no schema, defaults,
or validation (reference: tools/train.py:51-70, config/SiT/*), and duplicates
the patch-geometry lookup (`sub_ico_{k}` blocks) across all config files. Here
the same YAML files parse into typed dataclasses with validation, geometry
comes from ``geometry.patch_grid`` as the single source of truth (YAML blocks,
if present, are cross-checked), and TPU-specific knobs get explicit defaults
so reference configs run unmodified.
"""

from __future__ import annotations

import dataclasses
import os
from pathlib import Path
from typing import Any

import yaml

from surface_vision_transformers_tpu.geometry import patch_grid

# ---------------------------------------------------------------------------


def _get(d: dict, path: str, default: Any = ...) -> Any:
    cur: Any = d
    for key in path.split("."):
        if not isinstance(cur, dict) or key not in cur:
            if default is ...:
                raise KeyError(f"missing config key: {path}")
            return default
        cur = cur[key]
    return cur


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """SiT architecture (reference: models/sit.py:25-64 constructor args)."""

    dim: int = 192
    depth: int = 12
    heads: int = 3
    mlp_dim: int = 768
    pool: str = "cls"
    num_classes: int = 1
    num_channels: int = 4
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0
    num_patches: int = 320
    num_vertices: int = 153
    model: str = "SiT"

    def __post_init__(self):
        if self.pool not in ("cls", "mean"):
            raise ValueError(f"pool must be 'cls' or 'mean', got {self.pool!r}")
        if self.model not in ("SiT", "MS-SiT"):
            raise ValueError(f"unknown model {self.model!r}")

    @property
    def patch_dim(self) -> int:
        return self.num_channels * self.num_vertices

    @property
    def size_name(self) -> str:
        return {192: "tiny", 384: "small", 768: "base"}.get(self.dim, f"d{self.dim}")


@dataclasses.dataclass(frozen=True)
class MSSiTConfig:
    """MS-SiT hierarchy (``mssit:`` YAML block; active when
    ``transformer.model: MS-SiT``). ``resolution.sub_ico`` is the FINEST
    patch level for this family (e.g. ico 6 / sub_ico 5 -> 20,480 tokens)."""

    embed_dim: int = 96
    depths: tuple = (2, 2, 6, 2)
    heads: tuple = (3, 6, 12, 24)
    window: int = 64  # tokens per attention window (a power of 4)
    global_max: int = 512  # stages at or below this many tokens go global
    cross_mix: str = "axial"  # 'axial' | 'parent' | 'none'
    mlp_ratio: float = 4.0

    def __post_init__(self):
        if len(self.depths) != len(self.heads):
            raise ValueError("mssit.depths and mssit.heads lengths differ")
        if self.cross_mix not in ("axial", "parent", "none"):
            raise ValueError(f"unknown mssit.cross_mix {self.cross_mix!r}")


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    """Optimizer + schedule (reference: tools/train.py:228-243 and the
    StepLR/CosineDecay blocks that train.py reads but never uses)."""

    name: str = "SGD"
    lr: float = 1e-5
    weight_decay: float = 0.0
    momentum: float = 0.9
    nesterov: bool = False
    # schedule: 'constant' matches the reference's effective behaviour;
    # 'step' / 'cosine' / 'warmup_cosine' are first-class here.
    schedule: str = "constant"
    step_size: int = 1000
    step_decay: float = 0.5
    cosine_t_max: int = 5000
    cosine_eta_min: float = 1e-4
    warmup_steps: int = 0
    # global-norm gradient clipping applied before the optimizer update
    # (0 = off, the reference's behaviour)
    grad_clip: float = 0.0

    def __post_init__(self):
        if self.name not in ("SGD", "Adam", "AdamW"):
            raise ValueError(f"unknown optimiser {self.name!r}")
        if self.grad_clip < 0:
            raise ValueError("optimisation.grad_clip must be >= 0")
        if self.schedule not in ("constant", "step", "cosine", "warmup_cosine"):
            raise ValueError(f"unknown schedule {self.schedule!r}")


@dataclasses.dataclass(frozen=True)
class MPPConfig:
    """Masked-patch-pretraining corruption probabilities
    (reference: config/SiT/pretraining/mpp.yml:53-56, models/mpp.py:46-58)."""

    mask_prob: float = 0.75
    replace_prob: float = 0.8
    swap_prob: float = 0.02
    # The reference's optimizer misses the reconstruction head and mask token
    # (tools/pretrain.py:269-280 optimizes model.parameters() only); we train
    # them by default and keep a switch for strict recipe reproduction.
    optimize_decoder: bool = True

    def __post_init__(self):
        for k in ("mask_prob", "replace_prob", "swap_prob"):
            v = getattr(self, k)
            if not 0.0 <= v <= 1.0:
                raise ValueError(f"pretraining_mpp.{k} must be in [0, 1]")
        if self.swap_prob > 0 and self.replace_prob >= 1.0:
            # swap rate is swap_prob/(1-replace_prob) (reference
            # models/mpp.py:91-92): at replace_prob 1.0 every masked token
            # becomes the mask token and the swap fraction is undefined
            raise ValueError(
                "pretraining_mpp.swap_prob > 0 requires replace_prob < 1"
            )


@dataclasses.dataclass(frozen=True)
class TrainingConfig:
    """Run hyperparameters (reference: config/SiT/training/hparams.yml:16-29)."""

    bs: int = 256
    bs_val: int = 0  # 0 -> use bs
    # split each batch into this many sequentially-processed microbatches,
    # accumulating gradients (fp32, weight-sum scaled — exact for the
    # weighted-mean losses) before the single optimizer update: the recipe's
    # effective batch size at ~1/grad_accum of the activation memory
    grad_accum: int = 1
    # exponential moving average of the params (0 = off): validation, the
    # best checkpoint and testing all use the EMA weights; the raw weights
    # keep training. Typical decay 0.999.
    ema: float = 0.0
    # save a rolling `last` checkpoint (state + best-so-far metadata) every
    # this many epochs (0 = off): preemption insurance — `--resume RUN_DIR`
    # continues the run from it
    ckpt_every: int = 0
    # write the best-val checkpoint the moment validation improves (the
    # reference's behaviour, tools/train.py:361-363). Default False DEFERS
    # the write: improvements snapshot the state on device (~1 ms) and the
    # files land once at end-of-run — each eager save costs a full
    # device->host state fetch (~4 s on this host's relay; 10 improvements
    # paid 77 s of the 100-epoch recipe). Mid-run crash insurance is
    # ckpt_every's rolling `last`, which carries best-so-far metadata.
    eager_best_ckpt: bool = False
    epochs: int = 100
    val_epoch: int = 10
    l1loss: bool = False
    testing: bool = False
    save_ckpt: bool = True
    finetuning: bool = True
    load_weights_ssl: bool = False
    load_weights_imagenet: bool = False
    dataset_ssl: str = "dhcp"
    seed: int = 0

    def __post_init__(self):
        if self.grad_accum < 1:
            raise ValueError("training.grad_accum must be >= 1")
        if not 0.0 <= self.ema < 1.0:
            raise ValueError("training.ema must be in [0, 1)")
        if self.bs % self.grad_accum:
            raise ValueError(
                f"training.bs ({self.bs}) must be divisible by "
                f"training.grad_accum ({self.grad_accum})"
            )


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """On-device rotation/warp augmentation (new capability; the reference
    has none — BASELINE config 2 requires it for native-space training)."""

    enabled: bool = False
    exact_rotations: bool = True
    num_warps: int = 8
    max_warp_deg: float = 15.0
    warp_prob: float = 0.5
    # one warp table per STEP instead of per sample: ~(K-1)/K of the warp
    # cost for less within-batch warp diversity (rotations unaffected)
    warp_per_batch: bool = False
    # 'quota' (default): exactly round(warp_prob*bs) samples warp per step,
    # split evenly across tables via a random permutation — each table then
    # costs a static batch slice (~1 batch pass total). 'multinomial':
    # independent per-sample draws (K full-batch passes).
    warp_assign: str = "quota"
    seed: int = 0
    # sphere surface GIFTI (POINTSET+TRIANGLE) giving the vertex coordinates
    # of the DATA's ordering; required when the patch table is in an atlas
    # ordering (e.g. dHCP) rather than this framework's canonical one
    sphere_path: str = ""


@dataclasses.dataclass(frozen=True)
class TPUConfig:
    """TPU-native knobs with no reference counterpart."""

    compute_dtype: str = "bfloat16"  # 'bfloat16' | 'float32'
    params_dtype: str = "float32"
    kernel_backend: str = "auto"  # 'auto' | 'xla' | 'pallas'
    matmul_precision: str = "default"  # 'default' | 'highest' (parity mode)
    # mesh axis sizes; -1 on the data axis means "all remaining devices"
    mesh_data: int = -1
    mesh_fsdp: int = 1
    mesh_model: int = 1
    mesh_pipe: int = 1  # GPipe stage sharding (parallel/pipeline.py)
    pipe_microbatches: int = 0  # 0 -> one microbatch per stage
    epoch_on_device: bool = True  # lax.scan over the epoch's batches
    torch_init: bool = True  # mirror torch Linear/LayerNorm init for recipe parity
    debug_nans: bool = False  # jax_debug_nans sanitizer (SURVEY §5)
    profile_epoch: int = -1  # write a jax.profiler trace for this epoch
    fused_train: bool = True  # fused-block kernels in the training forward
    # lax.scan the fused-train block stack over depth-stacked weights so the
    # block kernel pair (fwd + bwd) compiles ONCE instead of once per layer.
    # Measured at SiT-tiny bs=1024 (v5e, cold cache): first epoch 355 s -> 17 s
    # (21x) supervised, at ~10% steady-state throughput cost (the scan defeats
    # XLA's cross-block weight-prefetch overlap) — a dev-iteration knob, off
    # for production runs (which amortize the compile via the persistent
    # cache). The block stack itself is BITWISE the unrolled loop's (pinned
    # on chip); whole training steps agree to bf16 rounding only, because
    # XLA fuses the surrounding glue ops differently between the two
    # program shapes. Covers SiT AND MS-SiT on the train, inference, and
    # int8 serving fused paths (runner prints a hint when the first epoch
    # compile exceeds 60 s).
    scan_blocks: bool = False
    seq_sharding: bool = False  # shard token activations over the model axis
    # serving quantization: 'none' | 'int8' (W8A8 megakernel for evaluation
    # and cli.test — per-channel int8 weights, per-token dynamic int8
    # activations, int32 MXU accumulation; training is never quantized)
    quant: str = "none"


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Dataset locations (reference: config key data.*; path templates use
    {task}/{configuration} like tools/train.py:65)."""

    data_path: str = ""
    label_path: str = ""
    task: str = "scan_age"
    configuration: str = "template"
    dataset: str = "dHCP"
    split: str = "train"
    channels: int = 4
    # host-streaming input pipeline (datasets larger than HBM): 'auto'
    # streams when the device-resident epoch would need more than
    # ``streaming_budget_gb`` of HBM (the on-device path keeps the dataset
    # PLUS a permuted copy resident — see trainer._build_epoch_fn);
    # 'on'/'off' force it. No reference counterpart (its only scaling
    # mechanism is the torch DataLoader, tools/train.py:107-122).
    streaming: str = "auto"
    streaming_budget_gb: float = 8.0

    def __post_init__(self):
        if self.streaming not in ("auto", "on", "off"):
            raise ValueError(
                f"data.streaming must be 'auto'|'on'|'off', got {self.streaming!r}"
            )

    def resolved_data_path(self) -> str:
        if "{}" in self.data_path:
            return self.data_path.format(self.task, self.configuration)
        return self.data_path


@dataclasses.dataclass(frozen=True)
class Experiment:
    """Fully-resolved experiment config."""

    model: ModelConfig
    optim: OptimConfig
    training: TrainingConfig
    data: DataConfig
    tpu: TPUConfig
    mpp: MPPConfig | None
    augment: AugmentConfig = AugmentConfig()
    mssit: MSSiTConfig = MSSiTConfig()
    ico: int = 6
    sub_ico: int = 2
    logging_folder: str = "logs/SiT"
    ssl_weights_path: str = ""
    imagenet_weights: str = ""
    ckpt_path: str = ""
    raw: dict = dataclasses.field(default_factory=dict, hash=False, compare=False)

    @property
    def is_pretraining(self) -> bool:
        return self.mpp is not None


def _resolve_geometry(raw: dict) -> tuple[int, int, int, int]:
    ico = int(_get(raw, "resolution.ico", 6))
    sub_ico = int(_get(raw, "resolution.sub_ico", 2))
    num_patches, num_vertices = patch_grid(ico, sub_ico)
    block = raw.get(f"sub_ico_{sub_ico}")
    if block:
        if (int(block["num_patches"]), int(block["num_vertices"])) != (
            num_patches,
            num_vertices,
        ):
            raise ValueError(
                f"sub_ico_{sub_ico} YAML block {block} disagrees with geometry "
                f"formula {(num_patches, num_vertices)}"
            )
    return ico, sub_ico, num_patches, num_vertices


def from_dict(raw: dict) -> Experiment:
    """Build an Experiment from a reference-schema (or extended) config dict."""
    ico, sub_ico, num_patches, num_vertices = _resolve_geometry(raw)

    t = raw.get("transformer", {})
    model = ModelConfig(
        dim=int(t.get("dim", 192)),
        depth=int(t.get("depth", 12)),
        heads=int(t.get("heads", 3)),
        mlp_dim=int(t.get("mlp_dim", 768)),
        pool=t.get("pool", "cls"),
        num_classes=int(t.get("num_classes", 1)),
        num_channels=int(t.get("num_channels", 4)),
        dim_head=int(t.get("dim_head", 64)),
        dropout=float(t.get("dropout", 0.0)),
        emb_dropout=float(t.get("emb_dropout", 0.0)),
        num_patches=num_patches,
        num_vertices=num_vertices,
        model=t.get("model", "SiT"),
    )

    opt_name = _get(raw, "optimisation.optimiser", "SGD")
    opt_block = raw.get(opt_name, {})
    optim = OptimConfig(
        name=opt_name,
        lr=float(_get(raw, "training.LR", 1e-5)),
        weight_decay=float(opt_block.get("weight_decay", 0.0)),
        momentum=float(opt_block.get("momentum", 0.9)),
        nesterov=bool(opt_block.get("nesterov", False)),
        schedule=_get(raw, "optimisation.schedule", "constant"),
        step_size=int(_get(raw, "StepLR.stepsize", 1000)),
        step_decay=float(_get(raw, "StepLR.decay", 0.5)),
        cosine_t_max=int(_get(raw, "CosineDecay.T_max", 5000)),
        cosine_eta_min=float(_get(raw, "CosineDecay.eta_min", 1e-4)),
        warmup_steps=int(_get(raw, "optimisation.warmup_steps", 0)),
        grad_clip=float(_get(raw, "optimisation.grad_clip", 0.0)),
    )

    tr = raw.get("training", {})
    training = TrainingConfig(
        bs=int(tr.get("bs", 256)),
        bs_val=int(tr.get("bs_val", 0)),
        grad_accum=int(tr.get("grad_accum", 1)),
        ema=float(tr.get("ema", 0.0)),
        ckpt_every=int(tr.get("ckpt_every", 0)),
        eager_best_ckpt=bool(tr.get("eager_best_ckpt", False)),
        epochs=int(tr.get("epochs", 100)),
        val_epoch=int(tr.get("val_epoch", 10)),
        l1loss=bool(tr.get("l1loss", False)),
        testing=bool(tr.get("testing", False)),
        save_ckpt=bool(tr.get("save_ckpt", True)),
        finetuning=bool(tr.get("finetuning", True)),
        load_weights_ssl=bool(tr.get("load_weights_ssl", False)),
        load_weights_imagenet=bool(tr.get("load_weights_imagenet", False)),
        dataset_ssl=tr.get("dataset_ssl", "dhcp"),
        seed=int(tr.get("seed", 0)),
    )

    d = raw.get("data", {})
    stream_raw = d.get("streaming", "auto")
    if isinstance(stream_raw, bool):  # YAML `streaming: true` reads natural
        stream_raw = "on" if stream_raw else "off"
    data = DataConfig(
        data_path=d.get("data_path", ""),
        label_path=d.get("label_path", ""),
        task=d.get("task", "scan_age"),
        configuration=d.get("configuration", "template"),
        dataset=d.get("dataset", "dHCP"),
        split=d.get("split", "train"),
        channels=int(d.get("channels", model.num_channels)),
        streaming=str(stream_raw),
        streaming_budget_gb=float(d.get("streaming_budget_gb", 8.0)),
    )

    tp = raw.get("tpu", {})
    tpu = TPUConfig(
        compute_dtype=tp.get("compute_dtype", "bfloat16"),
        params_dtype=tp.get("params_dtype", "float32"),
        kernel_backend=tp.get("kernel_backend", "auto"),
        matmul_precision=tp.get("matmul_precision", "default"),
        mesh_data=int(tp.get("mesh_data", -1)),
        mesh_fsdp=int(tp.get("mesh_fsdp", 1)),
        mesh_model=int(tp.get("mesh_model", 1)),
        mesh_pipe=int(tp.get("mesh_pipe", 1)),
        pipe_microbatches=int(tp.get("pipe_microbatches", 0)),
        epoch_on_device=bool(tp.get("epoch_on_device", True)),
        torch_init=bool(tp.get("torch_init", True)),
        debug_nans=bool(tp.get("debug_nans", False)),
        profile_epoch=int(tp.get("profile_epoch", -1)),
        fused_train=bool(tp.get("fused_train", True)),
        scan_blocks=bool(tp.get("scan_blocks", False)),
        seq_sharding=bool(tp.get("seq_sharding", False)),
        quant=str(tp.get("quant", "none")),
    )
    if tpu.quant not in ("none", "int8"):
        raise ValueError(
            f"tpu.quant must be 'none' or 'int8', got {tpu.quant!r}"
        )

    mpp = None
    if "pretraining_mpp" in raw or raw.get("SSL") == "mpp":
        m = raw.get("pretraining_mpp", {})
        mpp = MPPConfig(
            mask_prob=float(m.get("mask_prob", 0.75)),
            replace_prob=float(m.get("replace_prob", 0.8)),
            swap_prob=float(m.get("swap_prob", 0.02)),
            optimize_decoder=bool(m.get("optimize_decoder", True)),
        )

    ms_raw = raw.get("mssit", {})
    mssit = MSSiTConfig(
        embed_dim=int(ms_raw.get("embed_dim", 96)),
        depths=tuple(int(d) for d in ms_raw.get("depths", (2, 2, 6, 2))),
        heads=tuple(int(h) for h in ms_raw.get("heads", (3, 6, 12, 24))),
        window=int(ms_raw.get("window", 64)),
        global_max=int(ms_raw.get("global_max", 512)),
        cross_mix=str(ms_raw.get("cross_mix", "axial")),
        mlp_ratio=float(ms_raw.get("mlp_ratio", 4.0)),
    )

    aug_raw = raw.get("augmentation", {})
    augment = AugmentConfig(
        enabled=bool(aug_raw.get("enabled", False)),
        exact_rotations=bool(aug_raw.get("exact_rotations", True)),
        num_warps=int(aug_raw.get("num_warps", 8)),
        max_warp_deg=float(aug_raw.get("max_warp_deg", 15.0)),
        warp_prob=float(aug_raw.get("warp_prob", 0.5)),
        warp_per_batch=bool(aug_raw.get("warp_per_batch", False)),
        warp_assign=str(aug_raw.get("warp_assign", "quota")),
        seed=int(aug_raw.get("seed", 0)),
        sphere_path=str(aug_raw.get("sphere_path", "")),
    )

    return Experiment(
        model=model,
        optim=optim,
        training=training,
        data=data,
        tpu=tpu,
        mpp=mpp,
        augment=augment,
        mssit=mssit,
        ico=ico,
        sub_ico=sub_ico,
        logging_folder=_get(raw, "logging.folder_to_save_model", "logs/SiT"),
        ssl_weights_path=str(_get(raw, "weights.ssl_mpp", "")),
        imagenet_weights=str(_get(raw, "weights.imagenet", "")),
        ckpt_path=str(_get(raw, "testing.path_to_ckpt", "")),
        raw=raw,
    )


def load_config(path: str | os.PathLike) -> Experiment:
    with open(path) as f:
        raw = yaml.safe_load(f)
    return from_dict(raw)


def dump_config_with_results(exp: Experiment, results: dict, path: str | os.PathLike):
    """Re-dump the run's config with a `results` block, mirroring the
    reference's self-documenting run folders (tools/train.py:352-359)."""
    out = dict(exp.raw)
    out["results"] = results
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(out, f, sort_keys=False)
