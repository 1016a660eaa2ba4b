"""PyTorch checkpoint interop: reference SiT / timm ViT -> flax params.

Replaces and extends the reference's weight plumbing:
  * reference SiT ``checkpoint.pth`` state dicts (saved at
    tools/train.py:361-363, reloaded at tools/testing.py:68) load into our
    param tree bit-exactly (fused no-bias QKV layout and (v c) patch-flatten
    order preserved);
  * MPP ``encoder-*.pt`` dicts (tools/pretrain.py:378-389) load as SSL
    initialization, including the reference's strict=False semantics
    (missing head keys tolerated);
  * timm ImageNet ViTs transfer transformer blocks + final norm only, exactly
    the key subset of reference utils/utils.py:11-35 (patch/pos embeddings
    never transfer — surface patches have different shapes).

All mapping functions operate on plain ``dict[str, np.ndarray]`` so torch is
only required to *read* .pth files (guarded import).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor (possibly on GPU / requires_grad)
    return t.detach().cpu().numpy()


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Read a .pt/.pth file into numpy arrays. Handles both bare state dicts
    and the reference's pretrain dicts holding ``model_state_dict``
    (tools/pretrain.py:378-383)."""
    import torch  # optional dependency, only for reading torch files

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]
    return {k: _np(v) for k, v in obj.items()}


# -- reference SiT state dict <-> flax params -------------------------------


def sit_params_from_torch(
    state: Mapping[str, Any], depth: int, strict: bool = True
) -> dict:
    """Map a reference-layout SiT state dict onto our flax param tree.

    Torch Linear weights are (out, in) and transpose to flax (in, out)
    kernels; LayerNorm weight/bias become scale/bias.
    """
    s = {k: _np(v) for k, v in state.items()}
    params: dict = {}

    def take(key: str) -> np.ndarray | None:
        if key not in s:
            if strict:
                raise KeyError(f"missing torch key {key}")
            return None
        return s.pop(key)

    def put(dst: dict, name: str, val) -> None:
        if val is not None:
            dst[name] = val

    put(params, "patch_embedding_kernel", _t(take("to_patch_embedding.1.weight")))
    put(params, "patch_embedding_bias", take("to_patch_embedding.1.bias"))
    put(params, "pos_embedding", take("pos_embedding"))
    put(params, "cls_token", take("cls_token"))

    encoder: dict = {}
    for i in range(depth):
        attn: dict = {}
        put(attn, "norm", _ln(take(f"transformer.layers.{i}.0.norm.weight"),
                              take(f"transformer.layers.{i}.0.norm.bias")))
        put(attn, "to_qkv", _lin(take(f"transformer.layers.{i}.0.fn.to_qkv.weight"), None))
        put(attn, "to_out", _lin(take(f"transformer.layers.{i}.0.fn.to_out.0.weight"),
                                 take(f"transformer.layers.{i}.0.fn.to_out.0.bias")))
        mlp: dict = {}
        put(mlp, "norm", _ln(take(f"transformer.layers.{i}.1.norm.weight"),
                             take(f"transformer.layers.{i}.1.norm.bias")))
        put(mlp, "fc1", _lin(take(f"transformer.layers.{i}.1.fn.net.0.weight"),
                             take(f"transformer.layers.{i}.1.fn.net.0.bias")))
        put(mlp, "fc2", _lin(take(f"transformer.layers.{i}.1.fn.net.3.weight"),
                             take(f"transformer.layers.{i}.1.fn.net.3.bias")))
        if attn:
            encoder[f"layers_{i}_attn"] = {k: v for k, v in attn.items() if v}
        if mlp:
            encoder[f"layers_{i}_mlp"] = {k: v for k, v in mlp.items() if v}
    if encoder:
        params["encoder"] = encoder

    put(params, "head_norm", _ln(take("mlp_head.0.weight"), take("mlp_head.0.bias")))
    put(params, "head", _lin(take("mlp_head.1.weight"), take("mlp_head.1.bias")))

    if strict and s:
        raise KeyError(f"unconsumed torch keys: {sorted(s)[:8]}...")
    return params


def mpp_params_from_torch(state: Mapping[str, Any], depth: int) -> dict:
    """Map a reference MPP (encoder-decoder) state dict onto our MPP tree:
    transformer.* keys nest under 'encoder', plus mask_token / to_original."""
    s = {k: _np(v) for k, v in state.items()}
    enc_state = {
        k[len("transformer."):]: v
        for k, v in s.items()
        if k.startswith("transformer.")
    }
    out: dict = {"encoder": sit_params_from_torch(enc_state, depth, strict=False)}
    if "mask_token" in s:
        out["mask_token"] = s["mask_token"]
    if "to_original.weight" in s:
        out["to_original"] = _lin(s["to_original.weight"], s.get("to_original.bias"))
    return out


def sit_params_to_torch(params: Mapping[str, Any], depth: int) -> dict[str, np.ndarray]:
    """Inverse mapping: export our flax params as a reference-layout state
    dict (numpy), so models trained here remain loadable by the reference."""
    p = params["params"] if "params" in params else params
    out: dict[str, np.ndarray] = {}
    out["to_patch_embedding.1.weight"] = _t(np.asarray(p["patch_embedding_kernel"]))
    out["to_patch_embedding.1.bias"] = np.asarray(p["patch_embedding_bias"])
    out["pos_embedding"] = np.asarray(p["pos_embedding"])
    out["cls_token"] = np.asarray(p["cls_token"])
    enc = p["encoder"]
    for i in range(depth):
        a, m = enc[f"layers_{i}_attn"], enc[f"layers_{i}_mlp"]
        out[f"transformer.layers.{i}.0.norm.weight"] = np.asarray(a["norm"]["scale"])
        out[f"transformer.layers.{i}.0.norm.bias"] = np.asarray(a["norm"]["bias"])
        out[f"transformer.layers.{i}.0.fn.to_qkv.weight"] = _t(np.asarray(a["to_qkv"]["kernel"]))
        out[f"transformer.layers.{i}.0.fn.to_out.0.weight"] = _t(np.asarray(a["to_out"]["kernel"]))
        out[f"transformer.layers.{i}.0.fn.to_out.0.bias"] = np.asarray(a["to_out"]["bias"])
        out[f"transformer.layers.{i}.1.norm.weight"] = np.asarray(m["norm"]["scale"])
        out[f"transformer.layers.{i}.1.norm.bias"] = np.asarray(m["norm"]["bias"])
        out[f"transformer.layers.{i}.1.fn.net.0.weight"] = _t(np.asarray(m["fc1"]["kernel"]))
        out[f"transformer.layers.{i}.1.fn.net.0.bias"] = np.asarray(m["fc1"]["bias"])
        out[f"transformer.layers.{i}.1.fn.net.3.weight"] = _t(np.asarray(m["fc2"]["kernel"]))
        out[f"transformer.layers.{i}.1.fn.net.3.bias"] = np.asarray(m["fc2"]["bias"])
    out["mlp_head.0.weight"] = np.asarray(p["head_norm"]["scale"])
    out["mlp_head.0.bias"] = np.asarray(p["head_norm"]["bias"])
    out["mlp_head.1.weight"] = _t(np.asarray(p["head"]["kernel"]))
    out["mlp_head.1.bias"] = np.asarray(p["head"]["bias"])
    return out


# -- timm ImageNet ViT transfer ----------------------------------------------


def imagenet_params_from_timm(
    params: dict, timm_state: Mapping[str, Any], depth: int
) -> dict:
    """Overlay timm ViT weights onto an existing param tree, transferring the
    same key subset as reference utils/utils.py:11-35: per-block norms, fused
    QKV, attention out-projection, MLP fc1/fc2, and the final norm (-> our
    head_norm). Patch and positional embeddings are left untouched."""
    s = {k: _np(v) for k, v in timm_state.items()}
    params = jax_tree_copy(params)
    enc = params["encoder"]
    for i in range(depth):
        a, m = enc[f"layers_{i}_attn"], enc[f"layers_{i}_mlp"]
        a["norm"]["scale"] = s[f"blocks.{i}.norm1.weight"]
        a["norm"]["bias"] = s[f"blocks.{i}.norm1.bias"]
        a["to_qkv"]["kernel"] = _t(s[f"blocks.{i}.attn.qkv.weight"])
        a["to_out"]["kernel"] = _t(s[f"blocks.{i}.attn.proj.weight"])
        a["to_out"]["bias"] = s[f"blocks.{i}.attn.proj.bias"]
        m["norm"]["scale"] = s[f"blocks.{i}.norm2.weight"]
        m["norm"]["bias"] = s[f"blocks.{i}.norm2.bias"]
        m["fc1"]["kernel"] = _t(s[f"blocks.{i}.mlp.fc1.weight"])
        m["fc1"]["bias"] = s[f"blocks.{i}.mlp.fc1.bias"]
        m["fc2"]["kernel"] = _t(s[f"blocks.{i}.mlp.fc2.weight"])
        m["fc2"]["bias"] = s[f"blocks.{i}.mlp.fc2.bias"]
    params["head_norm"]["scale"] = s["norm.weight"]
    params["head_norm"]["bias"] = s["norm.bias"]
    return params


# -- helpers -----------------------------------------------------------------


def _t(w: np.ndarray | None) -> np.ndarray | None:
    return None if w is None else np.ascontiguousarray(np.asarray(w).T)


def _ln(weight, bias) -> dict | None:
    if weight is None:
        return None
    return {"scale": np.asarray(weight), "bias": np.asarray(bias)}


def _lin(weight, bias) -> dict | None:
    if weight is None:
        return None
    d = {"kernel": _t(weight)}
    if bias is not None:
        d["bias"] = np.asarray(bias)
    return d


def jax_tree_copy(tree):
    if isinstance(tree, Mapping):
        return {k: jax_tree_copy(v) for k, v in tree.items()}
    return tree


def merge_params(base: dict, loaded: dict) -> dict:
    """strict=False overlay (reference tools/train.py:216 semantics): keys in
    ``loaded`` replace those in ``base``; missing keys keep base values.
    Shapes must agree for replaced leaves."""
    out = {}
    for k, v in base.items():
        if k in loaded:
            if isinstance(v, Mapping):
                out[k] = merge_params(v, loaded[k])
            else:
                lv = np.asarray(loaded[k])
                if tuple(lv.shape) != tuple(np.shape(v)):
                    raise ValueError(
                        f"shape mismatch for {k}: {lv.shape} vs {np.shape(v)}"
                    )
                out[k] = lv.astype(np.asarray(v).dtype)
        else:
            out[k] = v
    return out
