"""Torch(MONAI) <-> JAX weight conversion for AutoencoderKL checkpoints.

The reference saves ``autoencoder.state_dict()`` (MONAI AutoencoderKL keys,
no wrapper prefix — ``autoencoder.py:169-171``), sometimes nested as
``{"autoencoder_state_dict": ...}`` (``vae_loader.py:38-43``). This module
maps those keys onto this framework's Flax parameter tree and back:

* conv kernels: torch OIHW -> flax HWIO,
* linear weights: torch [out, in] -> flax [in, out],
* GroupNorm weight/bias -> GroupNormOp scale/bias.

Key layout per MONAI 1.5.1 (``uv.lock:859-861``), documented module-by-module
in ``docs/MONAI_NOTES.md``: sequential ``encoder.blocks.{n}`` /
``decoder.blocks.{n}`` built in construction order (conv_in, per-level res
blocks [+attention], down/up-sample, mid block, final norm, conv_out), with
MONAI ``Convolution`` wrappers adding a ``.conv`` segment and ``SABlock``
attention using ``to_q/to_k/to_v/out_proj`` (the ``use_combined_linear``
fused-``qkv`` variant is also handled). Every tensor is shape-checked; a
mismatch raises with the offending key so drift against a real MONAI
checkpoint is loud, not silent.

``disc_from_torch_state_dict`` handles the reference's PatchDiscriminator
checkpoints (``discriminator_epoch{N}.pth``; keys ``initial_conv.conv.*``,
``0.conv.*`` … ``final_conv.conv.*`` — MONAI_NOTES.md §3).
"""

from __future__ import annotations

from typing import Any

import numpy as np

__all__ = [
    "from_torch_state_dict",
    "to_torch_state_dict",
    "monai_layout",
    "disc_monai_layout",
    "disc_from_torch_state_dict",
    "disc_to_torch_state_dict",
    "optimizer_tree_from_torch",
]



def _to_flax_kernel(w: np.ndarray) -> np.ndarray:
    """torch conv weight (O, I, *K) -> flax kernel (*K, I, O), any spatial rank."""
    return np.transpose(w, (*range(2, w.ndim), 1, 0))


def _to_torch_weight(k: np.ndarray) -> np.ndarray:
    """flax kernel (*K, I, O) -> torch conv weight (O, I, *K), any spatial rank."""
    return np.transpose(k, (k.ndim - 1, k.ndim - 2, *range(0, k.ndim - 2)))

def _levels(config: dict) -> tuple[list[int], list[int], list[bool]]:
    channels = list(config["channels"])
    nrb = config.get("num_res_blocks", 2)
    num_res_blocks = [nrb] * len(channels) if isinstance(nrb, int) else list(nrb)
    attn = config.get("attention_levels")
    attention_levels = [False] * len(channels) if attn is None else list(attn)
    return channels, num_res_blocks, attention_levels


def monai_layout(config: dict) -> list[tuple[str, str, str]]:
    """Ordered [(flax_path, monai_prefix, kind)] for the whole model.

    kind: 'conv' (Convolution wrapper), 'rawconv' (bare nn.Conv), 'norm'
    (GroupNorm), 'attn' (SpatialAttentionBlock).
    flax_path uses '/'-joined module names matching models/autoencoder_kl.py.
    """
    channels, num_res_blocks, attention_levels = _levels(config)
    n_levels = len(channels)
    enc_attn = config.get("with_encoder_nonlocal_attn", True)
    dec_attn = config.get("with_decoder_nonlocal_attn", True)
    out: list[tuple[str, str, str]] = []

    def res_entries(flax_base: str, monai_base: str, in_ch: int, out_ch: int):
        out.append((f"{flax_base}/norm1", f"{monai_base}.norm1", "norm"))
        out.append((f"{flax_base}/conv1", f"{monai_base}.conv1.conv", "conv"))
        out.append((f"{flax_base}/norm2", f"{monai_base}.norm2", "norm"))
        out.append((f"{flax_base}/conv2", f"{monai_base}.conv2.conv", "conv"))
        if in_ch != out_ch:
            out.append((f"{flax_base}/nin_shortcut", f"{monai_base}.nin_shortcut.conv", "conv"))

    def attn_entries(flax_base: str, monai_base: str):
        out.append((f"{flax_base}/norm", f"{monai_base}.norm", "norm"))
        out.append((flax_base, f"{monai_base}.attn", "attn"))

    # ----- encoder ------------------------------------------------------
    n = 0
    out.append(("encoder/conv_in", f"encoder.blocks.{n}.conv", "conv")); n += 1
    in_ch = channels[0]
    for level in range(n_levels):
        out_ch = channels[level]
        for block in range(num_res_blocks[level]):
            res_entries(f"encoder/down_{level}_res_{block}", f"encoder.blocks.{n}", in_ch, out_ch)
            n += 1
            in_ch = out_ch
            if attention_levels[level]:
                attn_entries(f"encoder/down_{level}_attn_{block}", f"encoder.blocks.{n}")
                n += 1
        if level != n_levels - 1:
            out.append(
                (f"encoder/down_{level}_downsample/conv", f"encoder.blocks.{n}.conv.conv", "conv")
            )
            n += 1
    if enc_attn:
        res_entries("encoder/mid_res_1", f"encoder.blocks.{n}", channels[-1], channels[-1]); n += 1
        attn_entries("encoder/mid_attn", f"encoder.blocks.{n}"); n += 1
        res_entries("encoder/mid_res_2", f"encoder.blocks.{n}", channels[-1], channels[-1]); n += 1
    out.append(("encoder/norm_out", f"encoder.blocks.{n}", "norm")); n += 1
    out.append(("encoder/conv_out", f"encoder.blocks.{n}.conv", "conv")); n += 1

    # ----- quant convs ----------------------------------------------------
    out.append(("quant_conv_mu", "quant_conv_mu.conv", "conv"))
    out.append(("quant_conv_log_sigma", "quant_conv_log_sigma.conv", "conv"))
    out.append(("post_quant_conv", "post_quant_conv.conv", "conv"))

    # ----- decoder --------------------------------------------------------
    rev_channels = list(reversed(channels))
    rev_blocks = list(reversed(num_res_blocks))
    rev_attn = list(reversed(attention_levels))
    n = 0
    out.append(("decoder/conv_in", f"decoder.blocks.{n}.conv", "conv")); n += 1
    if dec_attn:
        res_entries("decoder/mid_res_1", f"decoder.blocks.{n}", rev_channels[0], rev_channels[0]); n += 1
        attn_entries("decoder/mid_attn", f"decoder.blocks.{n}"); n += 1
        res_entries("decoder/mid_res_2", f"decoder.blocks.{n}", rev_channels[0], rev_channels[0]); n += 1
    in_ch = rev_channels[0]
    for level in range(n_levels):
        out_ch = rev_channels[level]
        for block in range(rev_blocks[level]):
            res_entries(f"decoder/up_{level}_res_{block}", f"decoder.blocks.{n}", in_ch, out_ch)
            n += 1
            in_ch = out_ch
            if rev_attn[level]:
                attn_entries(f"decoder/up_{level}_attn_{block}", f"decoder.blocks.{n}")
                n += 1
        if level != n_levels - 1:
            out.append(
                (f"decoder/up_{level}_upsample/conv", f"decoder.blocks.{n}.conv.conv", "conv")
            )
            n += 1
    out.append(("decoder/norm_out", f"decoder.blocks.{n}", "norm")); n += 1
    out.append(("decoder/conv_out", f"decoder.blocks.{n}.conv", "conv")); n += 1
    return out


def _set(tree: dict, path: str, leaf: str, value: np.ndarray) -> None:
    node = tree
    for part in path.split("/"):
        node = node.setdefault(part, {})
    node[leaf] = value


def _get(tree: dict, path: str, leaf: str) -> np.ndarray:
    node = tree
    for part in path.split("/"):
        node = node[part]
    return np.asarray(node[leaf])


def from_torch_state_dict(state_dict: dict[str, Any], config: dict) -> dict:
    """MONAI state dict -> flax ``{"params": ...}`` variables tree."""
    state_dict = state_dict.get("autoencoder_state_dict", state_dict)
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: dict = {}

    def take(key: str) -> np.ndarray:
        if key not in sd:
            raise KeyError(
                f"torch checkpoint missing key {key!r}; layout drift vs MONAI? "
                f"(have e.g. {sorted(sd)[:5]})"
            )
        return sd.pop(key)

    for flax_path, monai_prefix, kind in monai_layout(config):
        if kind == "conv":
            w = take(f"{monai_prefix}.weight")  # OIHW
            _set(params, flax_path, "kernel", _to_flax_kernel(w))
            _set(params, flax_path, "bias", take(f"{monai_prefix}.bias"))
        elif kind == "norm":
            _set(params, flax_path, "scale", take(f"{monai_prefix}.weight"))
            _set(params, flax_path, "bias", take(f"{monai_prefix}.bias"))
        elif kind == "attn":
            if f"{monai_prefix}.qkv.weight" in sd:  # fused variant
                w = take(f"{monai_prefix}.qkv.weight")
                b = sd.pop(f"{monai_prefix}.qkv.bias", np.zeros(w.shape[0], w.dtype))
                c = w.shape[0] // 3
                for i, name in enumerate(("to_q", "to_k", "to_v")):
                    _set(params, f"{flax_path}/{name}", "kernel", w[i * c:(i + 1) * c].T)
                    _set(params, f"{flax_path}/{name}", "bias", b[i * c:(i + 1) * c])
            else:
                for name in ("to_q", "to_k", "to_v"):
                    _set(params, f"{flax_path}/{name}", "kernel",
                         take(f"{monai_prefix}.{name}.weight").T)
                    _set(params, f"{flax_path}/{name}", "bias",
                         take(f"{monai_prefix}.{name}.bias"))
            _set(params, f"{flax_path}/proj_attn", "kernel",
                 take(f"{monai_prefix}.out_proj.weight").T)
            _set(params, f"{flax_path}/proj_attn", "bias",
                 take(f"{monai_prefix}.out_proj.bias"))
        else:  # pragma: no cover
            raise AssertionError(kind)

    if sd:
        raise KeyError(f"unconsumed torch keys (layout drift?): {sorted(sd)[:10]}")
    return {"params": params}


def disc_monai_layout(num_layers_d: int = 3) -> list[tuple[str, str, bool]]:
    """Ordered [(flax_module, monai_prefix, has_bias)] for PatchDiscriminator.

    MONAI names its Sequential children ``initial_conv``, ``"0"`` …
    ``str(num_layers_d-1)``, ``final_conv`` (MONAI_NOTES.md §3); only the
    first and last convs carry biases (middle layers: ``bias=False``).
    """
    out = [("conv_0", "initial_conv.conv", True)]
    for layer in range(num_layers_d - 1):
        out.append((f"conv_{layer + 1}", f"{layer}.conv", False))
    out.append(("conv_penultimate", f"{num_layers_d - 1}.conv", False))
    out.append(("conv_final", "final_conv.conv", True))
    return out


def disc_from_torch_state_dict(
    state_dict: dict[str, Any], num_layers_d: int = 3
) -> dict:
    """MONAI PatchDiscriminator state dict -> flax variables tree."""
    state_dict = state_dict.get("discriminator_state_dict", state_dict)
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: dict = {}
    for flax_name, monai_prefix, has_bias in disc_monai_layout(num_layers_d):
        if f"{monai_prefix}.weight" not in sd:
            raise KeyError(
                f"discriminator checkpoint missing {monai_prefix}.weight "
                f"(have e.g. {sorted(sd)[:5]}); layout drift vs MONAI?"
            )
        w = sd.pop(f"{monai_prefix}.weight")
        params[flax_name] = {"kernel": _to_flax_kernel(w)}
        if has_bias:
            params[flax_name]["bias"] = sd.pop(f"{monai_prefix}.bias")
    if sd:
        raise KeyError(f"unconsumed discriminator keys (layout drift?): {sorted(sd)[:10]}")
    return {"params": params}


def disc_to_torch_state_dict(variables: dict, num_layers_d: int = 3) -> dict[str, np.ndarray]:
    """Flax PatchDiscriminator variables -> MONAI-named numpy state dict."""
    params = variables.get("params", variables)
    sd: dict[str, np.ndarray] = {}
    for flax_name, monai_prefix, has_bias in disc_monai_layout(num_layers_d):
        sd[f"{monai_prefix}.weight"] = _to_torch_weight(
            np.asarray(params[flax_name]["kernel"])
        )
        if has_bias:
            sd[f"{monai_prefix}.bias"] = np.asarray(params[flax_name]["bias"])
    return sd


def optimizer_tree_from_torch(
    opt_state_dict: dict,
    model_sd: dict,
    *,
    config: dict | None = None,
    kind: str = "autoencoder",
    num_layers_d: int = 3,
) -> tuple[dict, dict, int]:
    """torch.optim.Adam state dict -> (mu_tree, nu_tree, count) matching the
    flax param tree of :func:`from_torch_state_dict` / the discriminator
    converter.

    torch Adam indexes parameters by their position in ``model.parameters()``,
    which equals the model state dict's key order (these models carry no
    buffers — MONAI_NOTES.md §2-3). ``exp_avg``/``exp_avg_sq`` have the
    parameter's shape, so each converts with the parameter's own transpose
    rules by routing a name-keyed pseudo state dict through the weight
    converter.
    """
    names = list(model_sd)
    state = opt_state_dict.get("state", {})
    mu_sd: dict[str, np.ndarray] = {}
    nu_sd: dict[str, np.ndarray] = {}
    count = 0
    for i, name in enumerate(names):
        entry = state.get(i, state.get(str(i)))
        if entry is None:
            # a parameter that never received gradients has no Adam slots
            mu_sd[name] = np.zeros_like(np.asarray(model_sd[name]))
            nu_sd[name] = np.zeros_like(np.asarray(model_sd[name]))
        else:
            mu_sd[name] = np.asarray(entry["exp_avg"])
            nu_sd[name] = np.asarray(entry["exp_avg_sq"])
            count = max(count, int(entry["step"]))
    if kind == "autoencoder":
        mu = from_torch_state_dict(mu_sd, config)
        nu = from_torch_state_dict(nu_sd, config)
    else:
        mu = disc_from_torch_state_dict(mu_sd, num_layers_d)
        nu = disc_from_torch_state_dict(nu_sd, num_layers_d)
    return mu, nu, count


def to_torch_state_dict(variables: dict, config: dict) -> dict[str, np.ndarray]:
    """Flax variables -> MONAI-named numpy state dict (for export/parity)."""
    params = variables.get("params", variables)
    sd: dict[str, np.ndarray] = {}
    for flax_path, monai_prefix, kind in monai_layout(config):
        if kind == "conv":
            sd[f"{monai_prefix}.weight"] = _to_torch_weight(
                _get(params, flax_path, "kernel")
            )
            sd[f"{monai_prefix}.bias"] = _get(params, flax_path, "bias")
        elif kind == "norm":
            sd[f"{monai_prefix}.weight"] = _get(params, flax_path, "scale")
            sd[f"{monai_prefix}.bias"] = _get(params, flax_path, "bias")
        else:  # attn
            for name in ("to_q", "to_k", "to_v"):
                sd[f"{monai_prefix}.{name}.weight"] = _get(params, f"{flax_path}/{name}", "kernel").T
                sd[f"{monai_prefix}.{name}.bias"] = _get(params, f"{flax_path}/{name}", "bias")
            sd[f"{monai_prefix}.out_proj.weight"] = _get(params, f"{flax_path}/proj_attn", "kernel").T
            sd[f"{monai_prefix}.out_proj.bias"] = _get(params, f"{flax_path}/proj_attn", "bias")
    return sd
