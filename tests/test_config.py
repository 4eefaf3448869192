"""Config resolver tests: @ref resolution must match the reference's MONAI
ConfigParser behavior on the reference's own config files."""

import json

from pti_ldm_vae_tpu.config import (
    filter_comment_keys,
    load_config,
    resolve_bool,
    resolve_refs,
)

REFERENCE_CONFIG = "/root/reference/config/vae_dente_no_adv.json"


def test_simple_ref():
    cfg = resolve_refs({"a": 3, "b": "@a"})
    assert cfg["b"] == 3


def test_nested_ref_dot_and_hash():
    raw = {"outer": {"inner": [10, 20]}, "x": "@outer.inner", "y": "@outer#inner.1"}
    cfg = resolve_refs(raw)
    assert cfg["x"] == [10, 20]
    assert cfg["y"] == 20


def test_chained_refs():
    cfg = resolve_refs({"a": 1.5, "b": "@a", "c": "@b"})
    assert cfg["c"] == 1.5


def test_unresolved_ref_left_literal():
    cfg = resolve_refs({"a": "@does.not.exist"})
    assert cfg["a"] == "@does.not.exist"


def test_reference_config_file_resolves():
    cfg = load_config(REFERENCE_CONFIG)
    ae = cfg["autoencoder_def"]
    assert ae["spatial_dims"] == 2
    assert ae["in_channels"] == 1
    assert ae["out_channels"] == 1
    assert ae["latent_channels"] == 4
    assert ae["channels"] == [32, 64, 128, 128]
    train = cfg["autoencoder_train"]
    assert train["ar_vae_weight"] == 0.5  # @regularized_attributes.gamma
    assert train["ar_vae_enabled"] is False  # @regularized_attributes.enabled


def test_all_reference_configs_load():
    import glob

    for path in glob.glob("/root/reference/config/*.json"):
        cfg = load_config(path)
        assert isinstance(cfg, dict)
        # No raw JSON-parse failures and resolution terminates.
        json.dumps(cfg)


def test_filter_comment_keys():
    cfg = load_config(REFERENCE_CONFIG)
    mapping = filter_comment_keys(cfg["regularized_attributes"]["attribute_latent_mapping"])
    assert set(mapping) == {"height_0", "width_0", "width_1", "width_2", "width_3", "width_4"}


def test_resolve_bool():
    assert resolve_bool("true") and resolve_bool("1") and resolve_bool("Yes")
    assert not resolve_bool("false") and not resolve_bool("") and not resolve_bool(None)
    assert not resolve_bool("garbage")
    assert resolve_bool(True) and not resolve_bool(False)
