"""Mask-metric extraction tests: geometry correctness + CLI end-to-end."""

import json

import numpy as np
import pytest

from pti_ldm_vae_tpu.cli.compute_mask_metrics import (
    MetricConfig,
    compute_bbox,
    compute_dente_width,
    compute_edente_widths,
    main,
    pixel_offsets_mm,
)
from pti_ldm_vae_tpu.data.io import write_tif


def test_compute_bbox():
    mask = np.zeros((20, 30), dtype=np.uint8)
    mask[5:15, 10:25] = 1
    x0, y0, w, h = compute_bbox(mask)
    assert (x0, y0, w, h) == (10, 5, 15, 10)
    with pytest.raises(ValueError):
        compute_bbox(np.zeros((4, 4), dtype=np.uint8))


def test_edente_widths_match_reference_rows():
    mask = np.zeros((40, 40), dtype=np.uint8)
    mask[10:30, 5:35] = 1
    x0, y0, w, h = compute_bbox(mask)
    height, widths = compute_edente_widths(mask, x0, y0, w, h, samples=3)
    assert height == 20
    # reference row selection: linspace(0, h, samples+2)[1:-1][::-1] + y
    expected_rows = np.linspace(0, h, 5, dtype=int)[1:-1][::-1] + y0
    expected = []
    for row in expected_rows:
        cols = np.where(mask[row, x0 : x0 + w] == 1)[0]
        expected.append(int(cols[-1] - cols[0] + 1) if cols.size else 0)
    assert widths == expected


def test_width_with_gaps_spans_extent():
    """Span is last-first+1, not the count of foreground pixels."""
    mask = np.zeros((4, 20), dtype=np.uint8)
    mask[2, 3] = 1
    mask[2, 10] = 1
    assert compute_dente_width(mask, 2) == 8
    assert compute_dente_width(mask, 0) == 0


def test_pixel_offsets_mm():
    assert pixel_offsets_mm([5.0, 10.0], 0.15) == [33, 67]


def test_cli_end_to_end(tmp_path):
    rng = np.random.default_rng(0)
    for sub in ("edente", "dente"):
        (tmp_path / sub).mkdir()
    for i in range(3):
        ed = np.zeros((64, 64), dtype=np.float32)
        ed[20:50, 10:54] = 1.0
        de = np.zeros((64, 64), dtype=np.float32)
        de[15:55, 12:52] = 1.0
        write_tif(str(tmp_path / "edente" / f"case_{i}.tif"), ed)
        write_tif(str(tmp_path / "dente" / f"case_{i}.tif"), de)
    # one unmatched file (ignored)
    write_tif(str(tmp_path / "edente" / "orphan.tif"), np.ones((8, 8), np.float32))

    summary = main([
        "--edente-dir", str(tmp_path / "edente"),
        "--dente-dir", str(tmp_path / "dente"),
        "--output-edente", str(tmp_path / "metrics" / "attributes_edente.json"),
        "--output-dente", str(tmp_path / "metrics" / "attributes_dente.json"),
        "--pixel-size-mm", "0.5",
        "--dente-heights-mm", "5", "10",
        "--edente-width-samples", "2",
    ])
    assert summary["edente_entries"] == 3 and summary["dente_entries"] == 3
    ed_attrs = json.loads((tmp_path / "metrics" / "attributes_edente.json").read_text())
    entry = ed_attrs["case_0.tif"]
    assert entry["height_0"] == 30
    assert set(entry) == {"height_0", "width_0", "width_1"}
    de_attrs = json.loads((tmp_path / "metrics" / "attributes_dente.json").read_text())
    # dente widths measured at rows 63-10=53 and 63-20=43 (both inside fg)
    assert de_attrs["case_0.tif"]["width_0"] == 40
    assert de_attrs["case_0.tif"]["height_0"] == 30  # shares edente bbox height
