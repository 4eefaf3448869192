"""Latent-space analysis: batched encoding, PCA -> UMAP/t-SNE, plots, stats.

Equivalent of reference ``src/pti_ldm_vae/analysis/latent_space.py``:

* ``LatentSpaceAnalyzer.encode_images`` — deterministic (z_mu) encoding of
  image lists (``latent_space.py:104-179``). TPU-first: one jitted encode
  program at a fixed batch shape; the final partial batch is zero-padded so
  the program never retraces, and latents flatten in torch NCHW order for
  cache compatibility.
* PCA(50) preprocessing -> UMAP (gated on ``umap-learn``) or t-SNE (sklearn)
  with the same validation rules (``:181-290``),
* 2-D projection plotting — plotly when installed (reference behavior),
  otherwise a matplotlib PNG fallback with the same per-patient coloring,
* inter-group distance statistics -> ``distance_metrics.txt`` /
  ``exams_sorted_by_distance.txt`` (``:459-536``).

Host-side numbers (sklearn/umap are CPU libraries); only the encoding runs
on device.
"""

from __future__ import annotations

import os
from collections import defaultdict
from glob import glob
from pathlib import Path
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.distance import cdist
from sklearn.decomposition import PCA
from sklearn.manifold import TSNE

from ..models.regressor import flatten_latent

__all__ = [
    "extract_patient_id_from_filename",
    "compute_distance_metrics",
    "ComposedProjection",
    "LatentSpaceAnalyzer",
    "load_image_paths",
]

try:  # optional
    import umap as _umap
except ImportError:  # pragma: no cover
    _umap = None

try:  # optional; matplotlib fallback below
    import plotly.graph_objects as _go
    import plotly.express as _px
except ImportError:  # pragma: no cover
    _go = None
    _px = None


def extract_patient_id_from_filename(filename: str) -> str:
    """``ID_HA_YEAR_MONTH_PATIENT.tif`` -> ``PATIENT``
    (reference ``latent_space.py:21-37``)."""
    stem = filename.rsplit(".", 1)[0] if "." in filename else filename
    parts = stem.split("_")
    return parts[-1] if parts else stem


def compute_distance_metrics(points1, points2):
    """(center_distance, std1, std2, mean_cross_distance) or None
    (reference ``latent_space.py:40-66``)."""
    if len(points1) == 0 or len(points2) == 0:
        return None
    points1 = np.array(points1)
    points2 = np.array(points2)
    center_distance = float(np.linalg.norm(points1.mean(axis=0) - points2.mean(axis=0)))
    std1 = float(np.mean(np.std(points1, axis=0))) if len(points1) > 1 else 0.0
    std2 = float(np.mean(np.std(points2, axis=0))) if len(points2) > 1 else 0.0
    mean_cross = float(np.mean(cdist(points1, points2)))
    return center_distance, std1, std2, mean_cross


# Fallback categorical palette (Plotly qualitative colors) used when plotly
# isn't installed; keeps legends comparable across environments.
_PALETTE = [
    "#636EFA", "#EF553B", "#00CC96", "#AB63FA", "#FFA15A",
    "#19D3F3", "#FF6692", "#B6E880", "#FF97FF", "#FECB52",
]


class ComposedProjection:
    """Fitted PCA -> UMAP pipeline whose ``transform`` takes RAW latents.

    The reference fits UMAP on PCA-50 vectors and aligns the second group by
    ``pca.transform`` then ``umap.transform`` (``analyze_interactive.py:
    571-590``); returning the bare UMAP model (as round 1 did) made
    ``.transform(raw_latents)`` a dimension-mismatch error.
    """

    def __init__(self, pca, umap_model):
        self.pca = pca
        self.umap = umap_model

    def transform(self, raw_latents: np.ndarray) -> np.ndarray:
        return self.umap.transform(self.pca.transform(raw_latents))


class LatentSpaceAnalyzer:
    """Encoder-driver + projection + plotting (functional model variant)."""

    def __init__(self, vae_model, vae_variables, transform: Callable[[str], np.ndarray],
                 *, batch_size: int = 8) -> None:
        self.vae = vae_model
        self.vae_variables = vae_variables
        self.transform = transform
        self.batch_size = batch_size

        @jax.jit
        def _encode(variables, images):
            z = vae_model.apply(variables, images, method=vae_model.encode_deterministic)
            return flatten_latent(z)

        self._encode = _encode

    # -- encoding -------------------------------------------------------------
    def encode_images(
        self, image_paths: list[str], max_images: int | None = None,
        batch_size: int | None = None, show_progress: bool = True,
    ) -> tuple[np.ndarray, list[str]]:
        """Deterministic z_mu encoding -> flattened latents [N, D] + ids."""
        if len(image_paths) == 0:
            raise ValueError("image_paths cannot be empty")
        if max_images is not None:
            image_paths = image_paths[:max_images]
        bsz = batch_size or self.batch_size

        latents = []
        ids = []
        for start in range(0, len(image_paths), bsz):
            chunk = image_paths[start : start + bsz]
            imgs = np.stack([np.asarray(self.transform(p), dtype=np.float32) for p in chunk])
            if imgs.ndim == 3:
                imgs = imgs[..., None]
            valid = len(chunk)
            if valid < bsz:  # zero-pad to the fixed program shape
                pad = np.zeros((bsz - valid, *imgs.shape[1:]), dtype=np.float32)
                imgs = np.concatenate([imgs, pad])
            z = np.asarray(self._encode(self.vae_variables, jnp.asarray(imgs)))[:valid]
            latents.append(z)
            ids.extend(extract_patient_id_from_filename(os.path.basename(p)) for p in chunk)
        return np.concatenate(latents, axis=0), ids

    # -- reduction -------------------------------------------------------------
    def _apply_pca(self, vectors: np.ndarray, n_components: int = 50):
        pca = PCA(n_components=n_components)
        return pca.fit_transform(vectors), pca

    # (see ComposedProjection below — returned by reduce_dimensionality_umap)

    def _validate(self, latent_vectors, pca_components, neighbor_param, neighbor_name):
        if latent_vectors.ndim != 2:
            raise ValueError(f"Expected 2D array, got {latent_vectors.ndim}D array")
        n = len(latent_vectors)
        if n < pca_components:
            raise ValueError(
                f"Need at least {pca_components} samples for PCA with {pca_components} "
                f"components, got {n} samples."
            )
        if neighbor_param >= n:
            raise ValueError(f"{neighbor_name} ({neighbor_param}) must be < n_samples ({n}).")

    def reduce_dimensionality_umap(
        self, latent_vectors: np.ndarray, n_components: int = 2, n_neighbors: int = 40,
        min_dist: float = 0.5, random_state: int = 42, pca_components: int = 50,
    ):
        """PCA -> UMAP (reference ``latent_space.py:181-238``).

        Returns ``(embedding, model)`` where ``model.transform`` accepts RAW
        latents — it composes the fitted PCA with the fitted UMAP, matching
        the reference's align-dente-via-transform flow
        (``analyze_static.py:249-257``, slider callback ``:571-590``).
        """
        self._validate(latent_vectors, pca_components, n_neighbors, "n_neighbors")
        if _umap is None:
            raise ImportError("Please install umap-learn: pip install umap-learn")
        vectors_pca, pca = self._apply_pca(latent_vectors, pca_components)
        model = _umap.UMAP(
            n_components=n_components, random_state=random_state,
            n_neighbors=n_neighbors, min_dist=min_dist,
        )
        embedding = model.fit_transform(vectors_pca)
        return embedding, ComposedProjection(pca, model)

    def reduce_dimensionality_tsne(
        self, latent_vectors: np.ndarray, n_components: int = 2, perplexity: int = 30,
        random_state: int = 42, pca_components: int = 50,
    ) -> np.ndarray:
        """PCA -> t-SNE (reference ``latent_space.py:240-290``)."""
        self._validate(latent_vectors, pca_components, perplexity, "perplexity")
        if perplexity < 5:
            print(f"Warning: perplexity={perplexity} is very low. Consider 5-50.")
        vectors_pca, _ = self._apply_pca(latent_vectors, pca_components)
        tsne = TSNE(n_components=n_components, perplexity=perplexity,
                    init="pca", random_state=random_state)
        return tsne.fit_transform(vectors_pca)

    # -- colors -------------------------------------------------------------
    def create_patient_colormap(self, patient_ids: list[str]):
        unique = sorted(set(patient_ids))
        patient_to_id = {p: i for i, p in enumerate(unique)}
        if _px is not None:
            colors = _px.colors.qualitative.Plotly + _px.colors.qualitative.Dark24
        else:
            colors = _PALETTE
        patient_to_color = {p: colors[i % len(colors)] for i, p in enumerate(unique)}
        return patient_to_id, patient_to_color

    # -- plotting -------------------------------------------------------------
    def plot_projection_2d(
        self, projections, output_path: str, title: str = "Latent Space Projection",
        color_by_patient: bool = True, show_labels: bool = True, image_paths_list=None,
    ) -> None:
        """2-D scatter of (vectors, ids, marker, name) groups. Plotly when
        available (hover + HTML parity with the reference), matplotlib PNG
        otherwise."""
        if _go is not None:
            self._plot_plotly(projections, output_path, title, color_by_patient,
                              show_labels, image_paths_list)
        else:
            self._plot_matplotlib(projections, output_path, title, color_by_patient)

    def _plot_plotly(self, projections, output_path, title, color_by_patient,
                     show_labels, image_paths_list):  # pragma: no cover - needs plotly
        fig = _go.Figure()
        if color_by_patient:
            all_ids = [i for _, ids, _, _ in projections for i in ids]
            patient_to_id, patient_to_color = self.create_patient_colormap(all_ids)
        symbols = {"o": "circle-open", "^": "triangle-up", "s": "square", "d": "diamond"}
        for proj_idx, (vectors, ids, marker, name) in enumerate(projections):
            paths = (image_paths_list[proj_idx]
                     if image_paths_list and proj_idx < len(image_paths_list) else None)
            if "dente" in name.lower() and "edente" not in name.lower():
                symbol = "circle" if marker == "o" else symbols.get(marker, "circle")
            else:
                symbol = symbols.get(marker, "circle-open")
            if color_by_patient:
                for exam in sorted(set(ids)):
                    idxs = [i for i, eid in enumerate(ids) if eid == exam]
                    hover = [
                        f"Patient: {ids[i]}<br>Group: {name}<br>Index: {i}"
                        + (f"<br>File: {os.path.basename(paths[i])}" if paths else "")
                        for i in idxs
                    ]
                    fig.add_trace(_go.Scatter(
                        x=[vectors[i, 0] for i in idxs], y=[vectors[i, 1] for i in idxs],
                        mode="markers",
                        name=(f"Patient {patient_to_id[exam]}: {exam} ({name})"
                              if show_labels else exam),
                        marker={"size": 10, "color": patient_to_color[exam],
                                "symbol": symbol, "opacity": 0.7,
                                "line": {"width": 1, "color": "white"}},
                        hovertext=hover, hoverinfo="text", showlegend=True,
                    ))
            else:
                fig.add_trace(_go.Scatter(
                    x=vectors[:, 0], y=vectors[:, 1], mode="markers", name=name,
                    marker={"size": 10, "symbol": symbol, "opacity": 0.7},
                ))
        fig.update_layout(title={"text": title, "x": 0.5}, width=1000, height=800,
                          template="plotly_white")
        if output_path.endswith(".html"):
            fig.write_html(output_path)
        else:
            try:
                fig.write_image(output_path, width=1000, height=800, scale=2)
            except Exception:
                fig.write_html(output_path.rsplit(".", 1)[0] + ".html")

    def _plot_matplotlib(self, projections, output_path, title, color_by_patient):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(10, 8))
        markers = {"o": "o", "^": "^", "s": "s", "d": "D"}
        if color_by_patient:
            all_ids = [i for _, ids, _, _ in projections for i in ids]
            _, patient_to_color = self.create_patient_colormap(all_ids)
        for vectors, ids, marker, name in projections:
            filled = "dente" in name.lower() and "edente" not in name.lower()
            colors = [patient_to_color[i] for i in ids] if color_by_patient else None
            ax.scatter(
                vectors[:, 0], vectors[:, 1], s=60, alpha=0.7,
                c=colors, marker=markers.get(marker, "o"),
                facecolors=None if filled else "none",
                edgecolors="white", linewidths=0.8, label=name,
            )
        ax.set_title(title)
        ax.set_xlabel("Dimension 1")
        ax.set_ylabel("Dimension 2")
        ax.legend(loc="upper left", bbox_to_anchor=(1.01, 1.0), fontsize=8)
        if output_path.endswith(".html"):
            output_path = output_path.rsplit(".", 1)[0] + ".png"
        fig.savefig(output_path, dpi=150, bbox_inches="tight")
        plt.close(fig)

    # -- statistics -------------------------------------------------------------
    def compute_group_statistics(self, projections, latent_vectors_list, output_dir: Path) -> None:
        """Per-exam distance report (reference ``latent_space.py:459-536``)."""
        if len(projections) != 2 or len(latent_vectors_list) != 2:
            return
        proj1, ids1, name1 = projections[0]
        proj2, ids2, name2 = projections[1]
        lat1 = latent_vectors_list[0][0]
        lat2 = latent_vectors_list[1][0]

        exam_proj = defaultdict(lambda: {name1: [], name2: []})
        exam_lat = defaultdict(lambda: {name1: [], name2: []})
        for i, exam in enumerate(ids1):
            exam_proj[exam][name1].append(proj1[i])
            exam_lat[exam][name1].append(lat1[i])
        for i, exam in enumerate(ids2):
            exam_proj[exam][name2].append(proj2[i])
            exam_lat[exam][name2].append(lat2[i])

        output_dir = Path(output_dir)
        exam_distances = []
        with open(output_dir / "distance_metrics.txt", "w", encoding="utf-8") as fh:
            fh.write("Distance Metrics per Exam (Latent Space and Projection)\n")
            fh.write("=" * 60 + "\n\n")
            for exam in sorted(exam_lat.keys()):
                g1, g2 = exam_lat[exam][name1], exam_lat[exam][name2]
                p1, p2 = exam_proj[exam][name1], exam_proj[exam][name2]
                if not g1 or not g2:
                    continue
                m_lat = compute_distance_metrics(g1, g2)
                m_proj = compute_distance_metrics(p1, p2)
                if not m_lat or not m_proj:
                    continue
                fh.write(f"{exam}\n")
                fh.write(f"  - n_{name1}: {len(g1)}, n_{name2}: {len(g2)}\n")
                fh.write(f"  - [Latent] center_dist: {m_lat[0]:.3f}, "
                         f"std_{name1}: {m_lat[1]:.3f}, std_{name2}: {m_lat[2]:.3f}, "
                         f"mean_cross_dist: {m_lat[3]:.3f}\n")
                fh.write(f"  - [Projection] center_dist: {m_proj[0]:.3f}, "
                         f"std_{name1}: {m_proj[1]:.3f}, std_{name2}: {m_proj[2]:.3f}, "
                         f"mean_cross_dist: {m_proj[3]:.3f}\n\n")
                exam_distances.append((exam, m_lat[0]))

        exam_distances.sort(key=lambda x: x[1])
        with open(output_dir / "exams_sorted_by_distance.txt", "w", encoding="utf-8") as fh:
            fh.write("Exams sorted by latent space center distance\n")
            fh.write("=" * 60 + "\n\n")
            for exam, dist in exam_distances:
                fh.write(f"{exam}: {dist:.3f}\n")

    def save_color_legend(self, exam_to_id, exam_to_color, output_path: Path) -> None:
        with open(output_path, "w", encoding="utf-8") as fh:
            fh.write("Color Legend for Exams\n")
            fh.write("=" * 60 + "\n\n")
            for exam in sorted(exam_to_id.keys(), key=lambda x: exam_to_id[x]):
                fh.write(f"{exam_to_id[exam]}: {exam} — {exam_to_color[exam]}\n")


def load_image_paths(data_dir: str, max_images: int | None = None,
                     extensions: list[str] | None = None) -> list[str]:
    """Sorted image paths with extension filtering (reference ``:555-589``)."""
    if extensions is None:
        extensions = [".tif", ".tiff"]
    paths: list[str] = []
    for ext in extensions:
        if not ext.startswith("."):
            ext = f".{ext}"
        paths.extend(glob(os.path.join(data_dir, f"*{ext}")))
    paths = sorted(paths)
    return paths[:max_images] if max_images is not None else paths
