"""Dataset assembly: path listing, seeded split, attribute join.

Split parity is metric-parity-critical (SURVEY.md §7 hard parts): the
reference shuffles with Python's ``random.seed(seed); random.shuffle(...)``
and splits at ``int(train_split * n)`` (``dataloaders.py:469-513``). We use
the *same stdlib shuffle* so the identical seed yields the identical split.

Documented divergence from the reference: its ``seed=None`` path crashes with
NameError (bug, SURVEY.md §2.4.4); here ``seed=None`` means "no shuffle" and
the split still happens.
"""

from __future__ import annotations

import json
import os
import random
from pathlib import Path
from typing import Any

__all__ = [
    "list_tif_paths",
    "load_attribute_json",
    "select_attribute_sources",
    "normalize_attributes",
    "attributes_for_paths",
    "split_dataset",
]


def list_tif_paths(data_base_dir: str, data_source: str) -> list[str]:
    """Sorted .tif paths for a source (reference ``dataloaders.py:15-47``):
    direct ``*.tif`` in the base dir win; otherwise ``edente``/``dente``
    subfolders (or both concatenated, edente first)."""
    base = Path(data_base_dir)
    direct = sorted(base.glob("*.tif"))
    if direct:
        return [str(p) for p in direct]
    if data_source == "edente":
        paths = sorted((base / "edente").glob("*.tif"))
    elif data_source == "dente":
        paths = sorted((base / "dente").glob("*.tif"))
    elif data_source == "both":
        paths = sorted((base / "edente").glob("*.tif")) + sorted((base / "dente").glob("*.tif"))
    else:
        raise ValueError(f"data_source must be 'edente', 'dente', or 'both', got '{data_source}'")
    if not paths:
        raise FileNotFoundError(f"No .tif images found in {data_base_dir}/{data_source}")
    return [str(p) for p in paths]


def load_attribute_json(attribute_file: str) -> dict[str, dict[str, float]]:
    """filename -> {attribute: value} (reference ``dataloaders.py:120-141``)."""
    if not os.path.exists(attribute_file):
        raise FileNotFoundError(f"Attribute file not found: {attribute_file}")
    try:
        with open(attribute_file, encoding="utf-8") as fh:
            return json.load(fh)
    except json.JSONDecodeError as exc:
        raise ValueError(f"Invalid attribute JSON: {attribute_file}") from exc


def select_attribute_sources(
    attribute_file: str | dict[str, str], data_source: str
) -> dict[str, dict[str, dict[str, float]]]:
    """Source-name -> attribute mapping (reference ``dataloaders.py:143-154``)."""
    if isinstance(attribute_file, str):
        return {data_source: load_attribute_json(attribute_file)}
    if isinstance(attribute_file, dict):
        return {src: load_attribute_json(path) for src, path in attribute_file.items()}
    raise ValueError(
        "regularized_attributes.attribute_file must be a string or mapping from source to file."
    )


def normalize_attributes(
    attributes: dict[str, float], normalize_cfg: dict[str, Any] | None
) -> dict[str, float]:
    """Optional divisor normalization (reference ``dataloaders.py:157-172``)."""
    if not normalize_cfg or not normalize_cfg.get("enabled", False):
        return attributes
    divisor = float(normalize_cfg.get("divisor", 1.0))
    if divisor == 0:
        raise ValueError("Normalization divisor must be non-zero.")
    return {key: float(value) / divisor for key, value in attributes.items()}


def attributes_for_paths(
    paths: list[str],
    attribute_sources: dict[str, dict[str, dict[str, float]]],
    attribute_latent_mapping: dict[str, Any],
    normalize_cfg: dict[str, Any] | None = None,
) -> list[dict[str, float]]:
    """Join + validate attributes per image path (reference
    ``dataloaders.py:175-219``): source inferred from the path ('edente'
    before 'dente' because the latter is a substring), missing entries or
    missing attribute keys raise."""
    wanted = [k for k in attribute_latent_mapping if not str(k).startswith("_")]
    out: list[dict[str, float]] = []
    for path in paths:
        base = os.path.basename(path)
        if "edente" in path:
            source_key = "edente"
        elif "dente" in path:
            source_key = "dente"
        else:
            raise ValueError(f"Cannot identify data source from path: {path}")
        entry = attribute_sources.get(source_key, {}).get(base)
        if entry is None:
            raise FileNotFoundError(f"Attribute entry missing for {base} in source {source_key}")
        filtered = {key: float(entry[key]) for key in wanted if key in entry}
        if len(filtered) != len(wanted):
            missing = set(wanted).difference(filtered)
            raise KeyError(f"Missing attributes for {base}: {missing}")
        out.append(normalize_attributes(filtered, normalize_cfg))
    return out


def split_dataset(
    paths: list[str],
    *,
    train_split: float = 0.9,
    seed: int | None = 42,
    attributes: list[dict[str, float]] | None = None,
    val_paths_override: list[str] | None = None,
) -> tuple[list[str], list[str], list | None, list | None]:
    """Seeded shuffle + split, byte-identical to the reference's ordering
    (``dataloaders.py:469-513``). Returns (train_paths, val_paths,
    train_attributes, val_attributes)."""
    if not 0 < train_split < 1:
        raise ValueError(f"train_split must be in (0, 1), got {train_split}")

    paths = list(paths)
    attrs = list(attributes) if attributes is not None else None
    if seed is not None:
        random.seed(seed)
        if attrs is not None:
            paired = list(zip(paths, attrs))
            random.shuffle(paired)
            paths = [p for p, _ in paired]
            attrs = [a for _, a in paired]
        else:
            random.shuffle(paths)

    if val_paths_override is not None:
        return paths, list(val_paths_override), attrs, None

    split_idx = int(train_split * len(paths))
    train_paths, val_paths = paths[:split_idx], paths[split_idx:]
    if attrs is not None:
        return train_paths, val_paths, attrs[:split_idx], attrs[split_idx:]
    return train_paths, val_paths, None, None
