"""Headline benchmark: SiT-tiny dHCP inference surfaces/sec/chip with the
fused on-device patchify+encode path (raw (B, 4, 40962) vertex input).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "surfaces/sec/chip", "vs_baseline": N}

Evidence-pipeline contract (hard-learned in round 4, where a driver timeout
lost every number): the headline JSON is computed and flushed IMMEDIATELY
after the first inference section; BENCH_DETAILS.json is atomically
rewritten after EVERY section; each section is wrapped in try/except so a
single failure degrades to a recorded error; and a wall-clock budget
(env BENCH_BUDGET_S, default 1200 s) skips remaining sections gracefully,
recording them as skipped instead of dying mid-run.

Timing methodology: this host reaches the TPU through an RPC relay where
per-dispatch latency is ~60 ms and async dispatch over-reports throughput, so
the benchmark runs the model inside an ON-DEVICE lax.scan loop (each
iteration's input is perturbed so nothing folds away) and reports
(t[n_iters] - t[1_iter]) / (n_iters - 1), fetching only a scalar.

vs_baseline compares against an ANALYTIC estimate of the reference PyTorch
pipeline on one A100, since the reference publishes no numbers and no A100
exists here to measure (SURVEY §6). Derivation: SiT-tiny forward is ~4.4
GFLOP/sample at L=321 — 3.4x the FLOPs of ViT-Tiny/16 (1.3 GFLOP, L=197),
same dim/depth. Published eager-PyTorch fp32 ViT-Tiny inference on A100 is
~5-7k img/s (dim-192 GEMMs and a materialized (B,3,L,L) softmax keep it far
from peak); scaling by FLOPs gives ~1.5-2k surfaces/s for the reference model.
We take the high end: BASELINE_A100_SURFACES_PER_S = 2_000. BASELINE.json's
>=10x target is met when vs_baseline >= 10. This stays an estimate until
someone runs the reference on a real A100; the raw surfaces/sec/chip value is
the number to trust either way.

Details (batch sweep, train-step throughput, per-family variants, int8,
augmentation, MS-SiT, serving artifacts) go to BENCH_DETAILS.json.
"""

import json
import os
import time
from pathlib import Path

import jax
import jax.numpy as jnp

BASELINE_A100_SURFACES_PER_S = 2_000.0
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1200"))

_T0 = time.perf_counter()
_DETAILS_PATH = Path(__file__).with_name("BENCH_DETAILS.json")


def _elapsed():
    return time.perf_counter() - _T0


def _flush_details(details):
    """Atomic replace so a kill mid-write never corrupts the on-disk file."""
    tmp = _DETAILS_PATH.with_suffix(".json.tmp")
    tmp.write_text(json.dumps(details, indent=2))
    os.replace(tmp, _DETAILS_PATH)


def timed_scan(fn, args, iters=51):
    """On-device loop timing; returns seconds per iteration."""

    def make(k):
        @jax.jit
        def loop(*a):
            def body(acc, i):
                return acc + fn(*a, i), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), jnp.arange(k))
            return acc

        return loop

    l1, ln = make(1), make(iters)
    float(l1(*args))
    float(ln(*args))
    t = time.perf_counter(); float(l1(*args)); t1 = time.perf_counter() - t
    t = time.perf_counter(); float(ln(*args)); tn = time.perf_counter() - t
    return max((tn - t1) / (iters - 1), 1e-9)


def main():
    from surface_vision_transformers_tpu.utils.env import enable_compilation_cache

    enable_compilation_cache()
    from surface_vision_transformers_tpu.geometry import load_patch_table
    from surface_vision_transformers_tpu.models import SiT
    from surface_vision_transformers_tpu.models.fused import fused_forward
    from surface_vision_transformers_tpu.train import Trainer
    from surface_vision_transformers_tpu.utils.config import from_dict

    table = load_patch_table(6, 2)
    key = jax.random.PRNGKey(0)
    model = SiT(
        dim=192, depth=12, heads=3, mlp_dim=768,
        num_patches=320, num_vertices=153, patch_table=table.indices,
    )
    params = model.init(key, jnp.zeros((1, 4, 40962)))

    details = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "model": "SiT-tiny sub-ico-2, fused patchify + megakernel blocks, bf16",
        "method": "on-device lax.scan loop, (t_n - t_1)/(n-1)",
        "budget_s": BUDGET_S,
        "sections_s": {},
    }
    _flush_details(details)

    # ---- headline section: SiT-tiny inference (runs unconditionally) ----
    best_tput, best_bs = 0.0, 0
    details["inference"] = {}
    for bs in (256, 1024):  # two points: latency-friendly and saturating
        # raw vertex features feed in bf16 (the model computes in bf16 and
        # normalization folds into the embed weights in fp32 either way);
        # halves the gather traffic vs fp32 feeds
        x = jax.random.normal(key, (bs, 4, 40962), jnp.bfloat16)

        def step(p, x, i):
            # bf16-representable additive perturbation (1 + i*1e-6 rounds to
            # exactly 1.0 in bf16) so iterations stay non-identical
            return fused_forward(
                model, p, x + i.astype(jnp.bfloat16) * jnp.bfloat16(2**-7)
            ).mean().astype(jnp.float32)

        dt = timed_scan(step, (params, x), iters=31 if bs <= 512 else 11)
        tput = bs / dt
        details["inference"][bs] = {
            "ms_per_batch": round(dt * 1e3, 3),
            "surfaces_per_s": round(tput, 1),
        }
        if tput > best_tput:
            best_tput, best_bs = tput, bs
    details["best_batch"] = best_bs
    details["baseline_a100_estimate_surfaces_per_s"] = BASELINE_A100_SURFACES_PER_S
    details["sections_s"]["inference"] = round(_elapsed(), 1)
    _flush_details(details)

    # The one line the driver captures — emitted NOW so a later timeout or
    # section crash cannot lose it.
    print(json.dumps({
        "metric": "SiT-tiny dHCP inference (fused patchify+encode)",
        "value": round(best_tput, 1),
        "unit": "surfaces/sec/chip",
        "vs_baseline": round(best_tput / BASELINE_A100_SURFACES_PER_S, 2),
    }), flush=True)

    # ---- remaining sections, in evidence-priority order ----

    def sec_train():
        # train-step throughput on the reference's supervised recipe (SGD
        # momentum 0.9, reference config/SiT/training/hparams.yml) at the
        # recipe bs=256 and the saturating bs=512/1024; raw vertices feed
        # bf16 like inference
        out = {}
        best_train = 0.0
        for bs, n_train in ((256, 2560), (512, 2560), (1024, 8192)):
            xb = jax.random.normal(key, (n_train, 4, 40962), jnp.bfloat16)
            yb = jax.random.normal(key, (n_train,))
            exp = from_dict({
                "resolution": {"ico": 6, "sub_ico": 2},
                "transformer": {"dim": 192, "depth": 12, "heads": 3,
                                "mlp_dim": 768},
                "training": {"LR": 1e-5, "bs": bs, "epochs": 1},
                "optimisation": {"optimiser": "SGD"},
                "SGD": {"momentum": 0.9},
            })
            trainer = Trainer(exp, model=model)
            state = trainer.init_state(xb[:1])
            t0 = time.perf_counter()
            state, _ = trainer.train_epoch(state, xb, yb)  # compile
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            state, m = trainer.train_epoch(state, xb, yb)
            epoch_s = time.perf_counter() - t0  # train_epoch fetches scalars
            out[bs] = {
                "steps": n_train // bs, "epoch_s": round(epoch_s, 4),
                "surfaces_per_s": round(n_train / epoch_s, 1),
                "compile_s": round(compile_s, 1),
            }
            best_train = max(best_train, n_train / epoch_s)
        out["best_surfaces_per_s"] = round(best_train, 1)
        return out

    def sec_train_augmented():
        # augmented training (BASELINE config 2's capability): on-device
        # exact icosahedral rotations + warps over a canonical generated
        # table
        from surface_vision_transformers_tpu.data.augment import SurfaceAugment
        from surface_vision_transformers_tpu.geometry import (
            generate_patch_table, remap_table_to_icosphere,
        )
        from surface_vision_transformers_tpu.geometry.tables import PatchTable

        tab_c, verts_c = generate_patch_table(6, 2)
        tab_c = remap_table_to_icosphere(tab_c, verts_c, 6)
        tab_c = PatchTable(tab_c, 6, 2, ordering="canonical").validate()
        # pre-patched input: the structured rotation fast path (patch-block
        # gather + orientation GEMMs); warps take the quota-assignment path
        xb_raw = jax.random.normal(key, (2560, 4, 40962), jnp.bfloat16)
        xb = xb_raw[:, :, jnp.asarray(tab_c.indices)]  # (N,4,320,153)
        yb = jax.random.normal(key, (2560,))
        exp_a = from_dict({
            "resolution": {"ico": 6, "sub_ico": 2},
            "transformer": {"dim": 192, "depth": 12, "heads": 3,
                            "mlp_dim": 768},
            "training": {"LR": 1e-5, "bs": 256, "epochs": 1},
            "optimisation": {"optimiser": "SGD"},
            "SGD": {"momentum": 0.9},
        })
        out = {}
        for aname, n_warps, per_batch in (
            ("rotations", 0, False),
            ("rotations+warps", 4, False),
            ("rotations+warps_per_batch", 4, True),
        ):
            aug = SurfaceAugment(ico=6, patch_table=tab_c.indices,
                                 exact_rotations=True, num_warps=n_warps,
                                 seed=0, warp_per_batch=per_batch)
            model_a = SiT(dim=192, depth=12, heads=3, mlp_dim=768,
                          num_patches=320, num_vertices=153)
            trainer_a = Trainer(exp_a, model=model_a, augment=aug)
            state_a = trainer_a.init_state(xb[:1])
            t0 = time.perf_counter()
            state_a, _ = trainer_a.train_epoch(state_a, xb, yb)  # compile
            compile_a = time.perf_counter() - t0
            t0 = time.perf_counter()
            state_a, _ = trainer_a.train_epoch(state_a, xb, yb)
            e_a = time.perf_counter() - t0
            out[aname] = {
                "bs": 256, "surfaces_per_s": round(2560 / e_a, 1),
                "compile_s": round(compile_a, 1),
            }
        return out

    def sec_mssit():
        # MS-SiT multiscale family (ico-6 level-5: 20,480 tokens) through
        # the fused megakernel runner (models/fused_mssit.py)
        from surface_vision_transformers_tpu.models import MSSiT
        from surface_vision_transformers_tpu.models.fused_mssit import (
            fused_mssit_forward,
        )

        out = {}
        tab_ms = load_patch_table(6, 5).indices
        model_ms = MSSiT(patch_table=tab_ms)
        params_ms = model_ms.init(key, jnp.zeros((1, 4, 40962)))
        bs_ms = 32
        xm = jax.random.normal(key, (bs_ms, 4, 40962), jnp.bfloat16)

        def step_ms(p, x, i):
            return fused_mssit_forward(
                model_ms, p, x + i.astype(jnp.bfloat16) * jnp.bfloat16(2**-7)
            ).mean().astype(jnp.float32)

        dt = timed_scan(step_ms, (params_ms, xm), iters=11)
        out["inference"] = {"bs": bs_ms, "ms_per_batch": round(dt * 1e3, 3),
                            "surfaces_per_s": round(bs_ms / dt, 1)}

        n_ms = 256
        xmt = jax.random.normal(key, (n_ms, 4, 40962), jnp.bfloat16)
        ymt = jax.random.normal(key, (n_ms,))
        exp_ms = from_dict({
            "resolution": {"ico": 6, "sub_ico": 5},
            "transformer": {"model": "MS-SiT", "num_channels": 4},
            "mssit": {"embed_dim": 96, "depths": [2, 2, 6, 2],
                      "heads": [3, 6, 12, 24]},
            "training": {"LR": 3e-4, "bs": bs_ms, "epochs": 1},
            "optimisation": {"optimiser": "AdamW"},
            "AdamW": {"weight_decay": 0.01},
        })
        trainer_ms = Trainer(exp_ms, patch_table=tab_ms)
        state_ms = trainer_ms.init_state(jnp.zeros((1, 4, 40962), jnp.float32))
        t0 = time.perf_counter()
        state_ms, _ = trainer_ms.train_epoch(state_ms, xmt, ymt)  # compile
        compile_ms = time.perf_counter() - t0
        t0 = time.perf_counter()
        state_ms, _ = trainer_ms.train_epoch(state_ms, xmt, ymt)
        e_ms = time.perf_counter() - t0
        out["train"] = {
            "bs": bs_ms, "surfaces_per_s": round(n_ms / e_ms, 1),
            "compile_s": round(compile_ms, 1),
        }
        return out

    def sec_mpp_pretrain():
        # MPP pretraining throughput (reference config/SiT/pretraining/mpp.yml
        # recipe semantics: mask 0.75 / replace 0.8 / swap 0.02, Adam) at
        # saturating batches — the fused-encoder path the pretrain driver uses
        out = {}
        best_mpp = {"surfaces_per_s": 0.0}
        for n_mpp, bs_mpp in ((2048, 512), (4096, 1024)):
            xb = jax.random.normal(key, (n_mpp, 4, 40962), jnp.bfloat16)
            exp_mpp = from_dict({
                "resolution": {"ico": 6, "sub_ico": 2},
                "transformer": {"dim": 192, "depth": 12, "heads": 3,
                                "mlp_dim": 768},
                "training": {"LR": 3e-4, "bs": bs_mpp, "epochs": 1},
                "optimisation": {"optimiser": "Adam"},
                "SSL": "mpp",
                "pretraining_mpp": {"mask_prob": 0.75, "replace_prob": 0.8,
                                    "swap_prob": 0.02},
            })
            trainer_mpp = Trainer(exp_mpp, patch_table=table.indices)
            state_mpp = trainer_mpp.init_state(xb[:1])
            t0 = time.perf_counter()
            state_mpp, _ = trainer_mpp.train_epoch(state_mpp, xb, None)
            compile_mpp = time.perf_counter() - t0
            t0 = time.perf_counter()
            state_mpp, _ = trainer_mpp.train_epoch(state_mpp, xb, None)
            mpp_s = time.perf_counter() - t0
            rec = {
                "bs": bs_mpp, "steps": n_mpp // bs_mpp,
                "surfaces_per_s": round(n_mpp / mpp_s, 1),
                "compile_s": round(compile_mpp, 1),
            }
            out[bs_mpp] = rec
            if rec["surfaces_per_s"] > best_mpp["surfaces_per_s"]:
                best_mpp = rec
        out["best_surfaces_per_s"] = best_mpp["surfaces_per_s"]
        return out

    def sec_latency():
        # serving latency: device-side ms per single forward at small batch
        # (p50-style number for online serving; the on-device scan excludes
        # the ~60 ms relay dispatch, which a co-located server wouldn't pay)
        out = {}
        for bs in (1, 8):
            x = jax.random.normal(key, (bs, 4, 40962), jnp.bfloat16)

            def step_l(p, x, i):
                return fused_forward(
                    model, p, x + i.astype(jnp.bfloat16) * jnp.bfloat16(2**-7)
                ).mean().astype(jnp.float32)

            dt = timed_scan(step_l, (params, x), iters=51)
            out[bs] = {"ms_per_forward": round(dt * 1e3, 3)}
        return out

    def sec_serving_artifact():
        # compiled jax.export artifact round-trip + latency: export the
        # default --serve blob (fused megakernels on TPU, pure-XLA
        # elsewhere), deserialize it like a deployment would, and time
        # rt.call. The runtime call is a host dispatch per invocation, so
        # timing pipelines N async calls and blocks once:
        # (t_N - t_1)/(N-1) amortizes the relay dispatch the way a serving
        # loop would.
        import tempfile

        from surface_vision_transformers_tpu.serving.artifact import (
            export_serving, load_serving,
        )

        out = {}
        with tempfile.TemporaryDirectory() as td:
            t0 = time.perf_counter()
            meta = export_serving(model, params["params"], td,
                                  batch_sizes=(1, 8))
            out["export_s"] = round(time.perf_counter() - t0, 1)
            out["numerics"] = meta["numerics"]
            out["platforms"] = meta["platforms"]
            for bs in (1, 8):
                fn, info = load_serving(td, bs)
                x = jax.random.normal(key, (bs, 4, 40962), jnp.bfloat16)
                y = fn(x)
                jax.block_until_ready(y)
                n = 30
                t0 = time.perf_counter()
                y = fn(x)
                jax.block_until_ready(y)
                t1 = time.perf_counter() - t0
                t0 = time.perf_counter()
                ys = [fn(x) for _ in range(n)]
                jax.block_until_ready(ys[-1])
                tn = time.perf_counter() - t0
                out[bs] = {
                    "ms_per_call_pipelined": round((tn - t1) / (n - 1) * 1e3, 3),
                    "ms_per_call_blocking": round(t1 * 1e3, 3),
                    "blob_bytes": meta["batch_sizes"][str(bs)]["bytes"],
                }
        return out

    def sec_variants():
        # model-family variants (inference, B=256): the framework is not
        # tuned to one shape
        out = {}
        for name, dim, heads, sub in (("small", 384, 6, 2),
                                      ("base", 768, 12, 2),
                                      ("tiny-subico1", 192, 3, 1)):
            tab_v = load_patch_table(6, sub)
            L, V = tab_v.indices.shape
            model_v = SiT(dim=dim, depth=12, heads=heads, mlp_dim=4 * dim,
                          num_patches=L, num_vertices=V,
                          patch_table=tab_v.indices)
            params_v = model_v.init(key, jnp.zeros((1, 4, 40962)))
            xv = jax.random.normal(key, (256, 4, 40962), jnp.bfloat16)

            def step_v(p, x, i, m=model_v):
                return fused_forward(
                    m, p, x + i.astype(jnp.bfloat16) * jnp.bfloat16(2**-7)
                ).mean().astype(jnp.float32)

            dt = timed_scan(step_v, (params_v, xv), iters=11)
            out[f"SiT-{name}"] = {
                "ms_per_batch_256": round(dt * 1e3, 3),
                "surfaces_per_s": round(256 / dt, 1),
            }
        return out

    def sec_inference_int8():
        # W8A8 int8 serving (tpu.quant: int8): per-channel int8 weights +
        # per-token dynamic int8 activations on the MXU's 2x int8 rate
        out = {}
        for name, dim, heads in (("tiny", 192, 3), ("base", 768, 12)):
            model_q = SiT(dim=dim, depth=12, heads=heads, mlp_dim=4 * dim,
                          num_patches=320, num_vertices=153,
                          patch_table=table.indices)
            params_q = model_q.init(key, jnp.zeros((1, 4, 40962)))
            bs_q = 256
            xq = jax.random.normal(key, (bs_q, 4, 40962), jnp.bfloat16)

            def step_q(p, x, i, m=model_q):
                return fused_forward(
                    m, p, x + i.astype(jnp.bfloat16) * jnp.bfloat16(2**-7),
                    quant="int8",
                ).mean().astype(jnp.float32)

            dt = timed_scan(step_q, (params_q, xq), iters=11)
            out[f"SiT-{name}"] = {
                "ms_per_batch_256": round(dt * 1e3, 3),
                "surfaces_per_s": round(bs_q / dt, 1),
            }
        return out

    def sec_variants_train():
        # model-family TRAINING coverage: SiT-small keeps the single-kernel
        # backward (dim 384 fits); SiT-base (dim 768) exercises the
        # flash-attention-based XLA-backward fallback
        out = {}
        for name, dim, heads, bs_t, n_t in (("small", 384, 6, 256, 1024),
                                            ("base", 768, 12, 128, 512)):
            tab_v = load_patch_table(6, 2)
            L, V = tab_v.indices.shape
            model_t = SiT(dim=dim, depth=12, heads=heads, mlp_dim=4 * dim,
                          num_patches=L, num_vertices=V,
                          patch_table=tab_v.indices)
            xb = jax.random.normal(key, (n_t, 4, 40962), jnp.bfloat16)
            yb = jax.random.normal(key, (n_t,))
            exp_t = from_dict({
                "resolution": {"ico": 6, "sub_ico": 2},
                "transformer": {"dim": dim, "depth": 12, "heads": heads,
                                "mlp_dim": 4 * dim},
                "training": {"LR": 1e-5, "bs": bs_t, "epochs": 1},
                "optimisation": {"optimiser": "SGD"},
                "SGD": {"momentum": 0.9},
            })
            trainer_t = Trainer(exp_t, model=model_t)
            state_t = trainer_t.init_state(xb[:1])
            t0 = time.perf_counter()
            state_t, _ = trainer_t.train_epoch(state_t, xb, yb)  # compile
            compile_t = time.perf_counter() - t0
            t0 = time.perf_counter()
            state_t, _ = trainer_t.train_epoch(state_t, xb, yb)
            e_t = time.perf_counter() - t0
            out[f"SiT-{name}"] = {
                "bs": bs_t, "surfaces_per_s": round(n_t / e_t, 1),
                "compile_s": round(compile_t, 1),
            }
        return out

    sections = [
        ("train", sec_train),
        ("train_augmented", sec_train_augmented),
        ("mssit", sec_mssit),
        ("mpp_pretrain", sec_mpp_pretrain),
        ("latency", sec_latency),
        ("serving_artifact", sec_serving_artifact),
        ("variants", sec_variants),
        ("inference_int8", sec_inference_int8),
        ("variants_train", sec_variants_train),
    ]
    for name, fn in sections:
        if _elapsed() > BUDGET_S:
            details[name] = {"skipped": f"time budget ({BUDGET_S:.0f}s) "
                                        f"exhausted at {_elapsed():.0f}s"}
            _flush_details(details)
            continue
        t_sec = time.perf_counter()
        try:
            details[name] = fn()
        except Exception as e:  # pragma: no cover - chip-session dependent
            details[name] = {"error": f"{type(e).__name__}: {e}"}
        details["sections_s"][name] = round(time.perf_counter() - t_sec, 1)
        _flush_details(details)


if __name__ == "__main__":
    main()
