"""MONAI DiffusionModelUNet checkpoint <-> flax DiffusionUNet conversion.

The reference keeps its UNet dormant and ships no trained UNet checkpoint
(``src/pti_ldm_vae/models/unet.py``, ``models/README.md:9-10``), so unlike
the VAE/discriminator converters this mapping could not be validated against
a real torch file inside this zero-egress image. It is written from the
MONAI 1.5.1 ``diffusion_model_unet.py`` structure (vendored notes:
``docs/MONAI_NOTES.md`` §4) and defends itself mechanically:

* :func:`unet_expected_torch_keys` emits the exact key set the converter
  consumes; ``tools/run_full_parity.py torch-side`` diffs it against the real
  ``state_dict()`` on the egress machine BEFORE dumping, so any layout drift
  surfaces as an explicit key diff rather than silent corruption;
* known historical spelling variants are accepted on load (``to_out.0`` vs
  ``out_proj`` for attention output projections, ``downsampler`` vs
  ``downsamplers.0``);
* both directions round-trip bit-exactly (``tests/test_unet_convert.py``).

Supported: ``with_conditioning=True`` configs (the flagship
``ldm_dente.json``; our transformer blocks always carry the cross-attention
path, matching MONAI's CrossAttn* blocks).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from .torch_convert import _to_flax_kernel, _to_torch_weight

__all__ = [
    "unet_monai_layout",
    "unet_expected_torch_keys",
    "unet_from_torch_state_dict",
    "unet_to_torch_state_dict",
]

# Accepted alternate spellings for MONAI prefixes (torch key families whose
# names shifted between generative-models releases).
_ALTERNATES = {
    ".to_out.0": (".out_proj",),
    ".downsampler.op.conv": (".downsamplers.0.op.conv", ".downsampler.conv"),
    ".upsampler.conv.conv": (".upsamplers.0.conv.conv", ".upsampler.conv"),
}


def unet_monai_layout(config: dict) -> list[tuple[str, str, str]]:
    """Ordered [(flax_spec, monai_prefix, kind)].

    flax_spec: '/'-joined module path; a ``:prefix`` suffix addresses the
    inline ``{prefix}_scale``/``{prefix}_bias`` params our modules carry for
    group norms. kind: 'conv' | 'linear' | 'linear_nb' | 'inorm' | 'lnorm'.
    """
    if not config.get("with_conditioning", True):
        raise NotImplementedError(
            "unet converter covers with_conditioning=True configs "
            "(MONAI uses different block classes without conditioning)"
        )
    channels = list(config["channels"])
    nrb = config.get("num_res_blocks", 2)
    attn = list(config["attention_levels"])
    out: list[tuple[str, str, str]] = [
        ("time_mlp_1", "time_embed.0", "linear"),
        ("time_mlp_2", "time_embed.2", "linear"),
        ("conv_in", "conv_in.conv", "conv"),
    ]

    def res(flax: str, monai: str, has_skip: bool):
        yield (f"{flax}:norm1", f"{monai}.norm1", "inorm")
        yield (f"{flax}/conv1", f"{monai}.conv1.conv", "conv")
        yield (f"{flax}/time_emb_proj", f"{monai}.time_emb_proj", "linear")
        yield (f"{flax}:norm2", f"{monai}.norm2", "inorm")
        yield (f"{flax}/conv2", f"{monai}.conv2.conv", "conv")
        if has_skip:
            yield (f"{flax}/skip", f"{monai}.skip_connection.conv", "conv")

    def attn_block(flax: str, monai: str):
        yield (f"{flax}:norm", f"{monai}.norm", "inorm")
        yield (f"{flax}/proj_in", f"{monai}.proj_in.conv", "conv")
        tb = f"{monai}.transformer_blocks.0"
        blk = f"{flax}/block"
        yield (f"{blk}/norm1", f"{tb}.norm1", "lnorm")
        for name in ("q", "k", "v"):
            yield (f"{blk}/attn1_{name}", f"{tb}.attn1.to_{name}", "linear_nb")
        yield (f"{blk}/attn1_out", f"{tb}.attn1.to_out.0", "linear")
        yield (f"{blk}/norm2", f"{tb}.norm2", "lnorm")
        for name in ("q", "k", "v"):
            yield (f"{blk}/attn2_{name}", f"{tb}.attn2.to_{name}", "linear_nb")
        yield (f"{blk}/attn2_out", f"{tb}.attn2.to_out.0", "linear")
        yield (f"{blk}/norm3", f"{tb}.norm3", "lnorm")
        yield (f"{blk}/ff_in", f"{tb}.ff.net.0.proj", "linear")
        yield (f"{blk}/ff_out", f"{tb}.ff.net.2", "linear")
        yield (f"{flax}/proj_out", f"{monai}.proj_out.conv", "conv")

    in_ch = channels[0]
    for i, ch in enumerate(channels):
        for j in range(nrb):
            out += list(res(f"down_{i}_res_{j}", f"down_blocks.{i}.resnets.{j}", in_ch != ch))
            in_ch = ch
            if attn[i]:
                out += list(attn_block(f"down_{i}_attn_{j}", f"down_blocks.{i}.attentions.{j}"))
        if i != len(channels) - 1:
            out.append((f"down_{i}_downsample", f"down_blocks.{i}.downsampler.op.conv", "conv"))

    out += list(res("mid_res_1", "middle_block.resnet_1", False))
    out += list(attn_block("mid_attn", "middle_block.attention"))
    out += list(res("mid_res_2", "middle_block.resnet_2", False))

    for idx, level in enumerate(reversed(range(len(channels)))):
        ch = channels[level]
        for j in range(nrb + 1):
            # up-path resnets always see concatenated skip input -> 1x1 skip conv
            out += list(res(f"up_{level}_res_{j}", f"up_blocks.{idx}.resnets.{j}", True))
            if attn[level]:
                out += list(attn_block(f"up_{level}_attn_{j}", f"up_blocks.{idx}.attentions.{j}"))
        if level != 0:
            out.append((f"up_{level}_upsample", f"up_blocks.{idx}.upsampler.conv.conv", "conv"))

    out += [(":norm_out", "out.0", "inorm"), ("conv_out", "out.2.conv", "conv")]
    return out


def unet_expected_torch_keys(config: dict) -> list[str]:
    """The torch key set the converter consumes (canonical spellings)."""
    keys: list[str] = []
    for _, monai, kind in unet_monai_layout(config):
        if kind == "linear_nb":
            keys.append(f"{monai}.weight")
        else:
            keys += [f"{monai}.weight", f"{monai}.bias"]
    return keys


def canonicalize_torch_key(key: str) -> str:
    """Map a known alternate MONAI spelling back to its canonical key.

    Layout-drift checks must compare canonicalized key sets — the converter
    itself accepts every ``_ALTERNATES`` spelling, so a MONAI install using
    one (e.g. ``out_proj`` for attention output) is NOT drift."""
    for canon, alts in _ALTERNATES.items():
        if canon in key:
            return key  # already canonical (guards substring alternates)
        for alt in alts:
            if alt in key:
                return key.replace(alt, canon)
    return key


def _set(tree: dict, path: str, leaf: str, value: np.ndarray) -> None:
    node = tree
    parts = [p for p in path.split("/") if p]
    for part in parts:
        node = node.setdefault(part, {})
    node[leaf] = value


def _get(tree: dict, path: str, leaf: str) -> np.ndarray:
    node = tree
    for part in [p for p in path.split("/") if p]:
        node = node[part]
    return np.asarray(node[leaf])


def _split_spec(spec: str) -> tuple[str, str | None]:
    if ":" in spec:
        path, prefix = spec.split(":")
        return path, prefix
    return spec, None


def unet_from_torch_state_dict(state_dict: dict[str, Any], config: dict) -> dict:
    """MONAI DiffusionModelUNet state dict -> flax variables tree."""
    state_dict = state_dict.get("unet_state_dict", state_dict)
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def take(key: str) -> np.ndarray:
        if key in sd:
            return sd.pop(key)
        for canon, alts in _ALTERNATES.items():
            if canon in key:
                for alt in alts:
                    alt_key = key.replace(canon, alt)
                    if alt_key in sd:
                        return sd.pop(alt_key)
        raise KeyError(
            f"torch checkpoint missing key {key!r}; layout drift vs MONAI? "
            f"(have e.g. {sorted(sd)[:5]})"
        )

    params: dict = {}
    for spec, monai, kind in unet_monai_layout(config):
        path, prefix = _split_spec(spec)
        if kind == "conv":
            _set(params, path, "kernel", _to_flax_kernel(take(f"{monai}.weight")))
            _set(params, path, "bias", take(f"{monai}.bias"))
        elif kind == "linear":
            _set(params, path, "kernel", take(f"{monai}.weight").T)
            _set(params, path, "bias", take(f"{monai}.bias"))
        elif kind == "linear_nb":
            _set(params, path, "kernel", take(f"{monai}.weight").T)
        elif kind == "lnorm":
            _set(params, path, "scale", take(f"{monai}.weight"))
            _set(params, path, "bias", take(f"{monai}.bias"))
        elif kind == "inorm":
            _set(params, path, f"{prefix}_scale", take(f"{monai}.weight"))
            _set(params, path, f"{prefix}_bias", take(f"{monai}.bias"))
        else:  # pragma: no cover
            raise AssertionError(kind)

    # num_batches_tracked etc. never exist here (no batch norms); anything
    # left over means the layout diverged.
    if sd:
        raise KeyError(f"unconsumed torch keys (layout drift?): {sorted(sd)[:10]}")
    return {"params": params}


def unet_to_torch_state_dict(variables: dict, config: dict) -> dict[str, np.ndarray]:
    """flax DiffusionUNet variables -> MONAI-keyed torch state dict (numpy)."""
    params = variables["params"] if "params" in variables else variables
    sd: dict[str, np.ndarray] = {}
    for spec, monai, kind in unet_monai_layout(config):
        path, prefix = _split_spec(spec)
        if kind == "conv":
            sd[f"{monai}.weight"] = _to_torch_weight(_get(params, path, "kernel"))
            sd[f"{monai}.bias"] = _get(params, path, "bias")
        elif kind == "linear":
            sd[f"{monai}.weight"] = np.asarray(_get(params, path, "kernel")).T
            sd[f"{monai}.bias"] = _get(params, path, "bias")
        elif kind == "linear_nb":
            sd[f"{monai}.weight"] = np.asarray(_get(params, path, "kernel")).T
        elif kind == "lnorm":
            sd[f"{monai}.weight"] = _get(params, path, "scale")
            sd[f"{monai}.bias"] = _get(params, path, "bias")
        elif kind == "inorm":
            sd[f"{monai}.weight"] = _get(params, path, f"{prefix}_scale")
            sd[f"{monai}.bias"] = _get(params, path, f"{prefix}_bias")
        else:  # pragma: no cover
            raise AssertionError(kind)
    return sd
