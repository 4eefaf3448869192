"""Static latent-space projection CLI (UMAP / t-SNE -> PNG/HTML).

Workload parity with ``vae_scripts/analyze_static.py`` (SURVEY.md §3.5):
cached group encoding, PCA->UMAP (dente aligned through the fitted model's
``transform``, reference ``analyze_static.py:249-257``) or joint t-SNE split
afterwards (``:263-279``), high-res figure export, per-exam distance stats.
Figures use plotly+kaleido when installed, otherwise the matplotlib fallback
inside ``LatentSpaceAnalyzer``; UMAP requires ``umap-learn`` (gated) — t-SNE
always works (sklearn).
"""

from __future__ import annotations

import argparse

import numpy as np

from ..analysis import LatentSpaceAnalyzer
from ..analysis.common import (
    compute_and_save_statistics,
    create_transforms,
    load_and_encode_group_with_cache,
    load_vae_model,
    save_visualization_and_legend,
    set_seed,
    setup_device_and_output,
)

__all__ = ["main"]


def parse_args(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(description="Static Latent Space Analysis (UMAP or t-SNE)")
    parser.add_argument("--vae-weights", type=str, required=True)
    parser.add_argument("--config-file", type=str, required=True)
    parser.add_argument("--folder-edente", type=str, required=True)
    parser.add_argument("--folder-dente", type=str, default=None)
    parser.add_argument("--output-dir", type=str, default="projections")
    parser.add_argument("--max-images", type=int, default=1000)
    parser.add_argument("--patch-size", type=int, nargs=2, default=[256, 256])
    parser.add_argument("--color-by-patient", action="store_true")
    parser.add_argument("--method", type=str, choices=["umap", "tsne"], default="umap")
    parser.add_argument("--n-neighbors", type=int, default=40)
    parser.add_argument("--min-dist", type=float, default=0.5)
    parser.add_argument("--perplexity", type=int, default=30)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--subtitle", type=str, default=None)
    parser.add_argument("--dpi", type=int, default=300)
    parser.add_argument("--cache-dir", type=str, default="cache/latents")
    return parser.parse_args(argv)


def main(argv=None) -> None:
    args = parse_args(argv)
    set_seed(args.seed)
    print(f"Static Latent Space Analysis - {args.method.upper()}")

    _, output_dir = setup_device_and_output(args.output_dir)
    model, variables = load_vae_model(args.config_file, args.vae_weights)
    transform = create_transforms(tuple(args.patch_size))
    analyzer = LatentSpaceAnalyzer(model, variables, transform)

    latent_edente, ids_edente, paths_edente = load_and_encode_group_with_cache(
        analyzer, args.folder_edente, args.vae_weights,
        args.max_images, tuple(args.patch_size), "edente", cache_dir=args.cache_dir,
    )
    latent_dente = ids_dente = paths_dente = None
    if args.folder_dente:
        latent_dente, ids_dente, paths_dente = load_and_encode_group_with_cache(
            analyzer, args.folder_dente, args.vae_weights,
            args.max_images, tuple(args.patch_size), "dente", cache_dir=args.cache_dir,
        )

    projections = []
    proj_dente = None
    if args.method == "umap":
        proj_edente, umap_model = analyzer.reduce_dimensionality_umap(
            latent_edente, n_neighbors=args.n_neighbors, min_dist=args.min_dist,
            random_state=args.seed, pca_components=min(len(latent_edente), 50),
        )
        projections.append((proj_edente, ids_edente, "o", "edente"))
        if args.folder_dente:
            # Align dente through the fitted UMAP (reference ``:249-257``).
            proj_dente = (
                umap_model.transform(latent_dente)
                if hasattr(umap_model, "transform")
                else analyzer.reduce_dimensionality_umap(latent_dente, n_neighbors=args.n_neighbors)[0]
            )
            projections.append((proj_dente, ids_dente, "o_filled", "dente"))
        output_filename = "umap_projection.png"
        title = "UMAP"
    else:
        combined = (
            np.concatenate([latent_edente, latent_dente]) if args.folder_dente else latent_edente
        )
        # Fit t-SNE jointly then split (reference ``:263-279``).
        tsne_combined = analyzer.reduce_dimensionality_tsne(
            combined, perplexity=args.perplexity, random_state=args.seed,
            pca_components=min(len(combined), 50),
        )
        split = len(latent_edente)
        proj_edente = tsne_combined[:split]
        projections.append((proj_edente, ids_edente, "o", "edente"))
        if args.folder_dente:
            proj_dente = tsne_combined[split:]
            projections.append((proj_dente, ids_dente, "o_filled", "dente"))
        output_filename = "tsne_projection.png"
        title = "t-SNE"

    if args.folder_dente:
        title = f"{title} (dente filled, edente open)"
    if args.subtitle:
        title = f"{title} — {args.subtitle}"

    save_visualization_and_legend(
        analyzer, projections, output_dir, title, args.color_by_patient,
        ids_edente, ids_dente, output_filename,
        image_paths_list=[paths_edente] + ([paths_dente] if paths_dente else []),
    )

    if args.folder_dente:
        compute_and_save_statistics(
            analyzer, proj_edente, proj_dente, latent_edente, latent_dente,
            ids_edente, ids_dente, "edente", "dente", output_dir,
        )
    print("Analysis complete.")


if __name__ == "__main__":
    main()
