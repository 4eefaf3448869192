"""AR-VAE channel viewer (Dash app; static matplotlib export fallback).

Workload parity with ``vae_scripts/analyze_ar_channels.py`` (SURVEY.md §2.1
#29): for one input image — original, deterministic reconstruction, and a
per-channel heatmap grid of the latent means, with AR-regularized channels
labeled by their attribute names. The reference script crashes at import
(``TifReader`` pulled from a module that never defines it, SURVEY.md §2.4.2);
fixed here. Without ``dash`` installed (or with ``--export``) the same grid
is written as a PNG.
"""

from __future__ import annotations

import argparse

import numpy as np

from ..analysis.common import create_transforms
from ..config import filter_comment_keys
from ..utils.cli_common import load_config_and_model

__all__ = [
    "main",
    "encode_image",
    "extract_attr_channels",
    "export_static_grid",
    "select_channel_payload",
]

try:
    import dash  # noqa: F401
    _HAS_DASH = True
except ImportError:  # pragma: no cover
    _HAS_DASH = False


def parse_args(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(description="AR-VAE latent channel viewer")
    parser.add_argument("-c", "--config-file", required=True, help="Path to AR-VAE config JSON.")
    parser.add_argument("--checkpoint", required=True, help="Path to VAE checkpoint.")
    parser.add_argument("--image-path", required=True, help="Path to the input .tif image.")
    parser.add_argument("--port", type=int, default=8052)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--export", action="store_true",
                        help="Write a static PNG grid instead of serving the app")
    parser.add_argument("--output", type=str, default="ar_channels.png")
    return parser.parse_args(argv)


def extract_attr_channels(config) -> dict[str, int]:
    """attribute name -> latent channel (reference ``analyze_ar_channels.py:
    build mapping``); comment keys filtered."""
    reg = getattr(config, "regularized_attributes", None)
    if not reg:
        raise ValueError("Config is missing regularized_attributes.")
    mapping = filter_comment_keys(reg.get("attribute_latent_mapping", {}))
    if not mapping:
        raise ValueError("attribute_latent_mapping is empty.")
    return {name: int(meta["latent_channel"]) for name, meta in mapping.items()}


def encode_image(image_path: str, model, variables, transform):
    """(reconstruction [H, W], latents [C, h, w]) — deterministic."""
    import jax.numpy as jnp

    img = np.asarray(transform(image_path), dtype=np.float32)
    if img.ndim == 2:
        img = img[..., None]
    batch = jnp.asarray(img[None])
    z_mu = model.apply(variables, batch, method=model.encode_deterministic)
    recon = model.apply(variables, z_mu, method=model.decode_stage_2_outputs)
    latents = np.transpose(np.asarray(z_mu)[0], (2, 0, 1))  # NHWC -> CHW
    return np.asarray(recon)[0, :, :, 0], latents, img[..., 0]


def _normalize_unit(data: np.ndarray) -> np.ndarray:
    lo, hi = float(data.min()), float(data.max())
    if hi <= lo:
        return np.zeros_like(data)
    return (data - lo) / (hi - lo)


def export_static_grid(original, reconstruction, latents, attr_to_channel, output: str) -> None:
    """Original | reconstruction | per-channel latent heatmaps -> PNG."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    channel_to_attr = {v: k for k, v in attr_to_channel.items()}
    n_channels = latents.shape[0]
    cols = 4
    rows = 1 + -(-n_channels // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(4 * cols, 4 * rows))
    axes = np.atleast_2d(axes)
    axes[0, 0].imshow(_normalize_unit(original), cmap="gray")
    axes[0, 0].set_title("Original")
    axes[0, 1].imshow(_normalize_unit(reconstruction), cmap="gray")
    axes[0, 1].set_title("Reconstruction")
    for j in range(2, cols):
        fig.delaxes(axes[0, j])
    for c in range(n_channels):
        ax = axes[1 + c // cols, c % cols]
        ax.imshow(latents[c], cmap="viridis")
        label = f"z[{c}]"
        if c in channel_to_attr:
            label += f" — {channel_to_attr[c]} (AR)"
        ax.set_title(label, fontsize=10)
    for c in range(n_channels, (rows - 1) * cols):
        fig.delaxes(axes[1 + c // cols, c % cols])
    for ax in fig.axes:
        ax.set_xticks([])
        ax.set_yticks([])
    plt.tight_layout()
    fig.savefig(output, dpi=130)
    plt.close(fig)
    print(f"Wrote {output}")


def select_channel_payload(latents: np.ndarray, attr_to_channel: dict[str, int],
                           selected_channel: int | None) -> dict:
    """Channel-dropdown callback body (dash-free, directly testable) —
    reference ``analyze_ar_channels.py:272-299`` ``update_channel_fig``:
    selected channel -> {title, unit-normalized heatmap data, valid flag}."""
    if selected_channel is None:
        return {"title": "No channel", "data": np.zeros_like(latents[0]), "valid": False}
    if not 0 <= selected_channel < latents.shape[0]:
        return {
            "title": f"{selected_channel} (out of range)",
            "data": np.zeros_like(latents[0]),
            "valid": False,
        }
    attr_name = next(
        (name for name, idx in attr_to_channel.items() if idx == selected_channel), None
    )
    title = (
        f"ch {selected_channel}: {attr_name} (regularized)"
        if attr_name else f"ch {selected_channel}: unmapped"
    )
    return {
        "title": title,
        "data": _normalize_unit(latents[selected_channel]),
        "valid": True,
    }


def _build_dash_app(original, reconstruction, latents, attr_to_channel):  # pragma: no cover
    import dash
    from dash import dcc, html
    import plotly.graph_objects as go

    def heatmap(data, title, colorscale="Viridis"):
        fig = go.Figure(data=go.Heatmap(z=np.squeeze(data), colorscale=colorscale))
        fig.update_layout(title=title, margin={"l": 0, "r": 0, "t": 30, "b": 0},
                          height=340, width=340)
        fig.update_xaxes(scaleanchor="y", scaleratio=1)
        fig.update_yaxes(autorange="reversed")
        return fig

    channel_to_attr = {v: k for k, v in attr_to_channel.items()}
    app = dash.Dash(__name__)
    default_channel = min(channel_to_attr) if channel_to_attr else 0
    channel_options = [
        {
            "label": f"z[{c}]" + (f" — {channel_to_attr[c]} (AR)" if c in channel_to_attr else ""),
            "value": c,
        }
        for c in range(latents.shape[0])
    ]
    app.layout = html.Div([
        html.Div([
            dcc.Graph(figure=heatmap(_normalize_unit(original), "Original", "Gray")),
            dcc.Graph(figure=heatmap(_normalize_unit(reconstruction), "Reconstruction", "Gray")),
        ], style={"display": "flex"}),
        html.Div([
            html.H4("Latent Channel"),
            dcc.Dropdown(id="channel-dropdown", options=channel_options,
                         value=default_channel, clearable=False),
            dcc.Graph(id="channel-fig"),
        ]),
    ])

    @app.callback(
        dash.Output("channel-fig", "figure"),
        dash.Input("channel-dropdown", "value"),
    )
    def update_channel_fig(selected_channel):
        payload = select_channel_payload(latents, attr_to_channel, selected_channel)
        return heatmap(payload["data"], payload["title"])

    return app


def main(argv=None):
    args = parse_args(argv)
    config, (model, variables) = load_config_and_model(args.config_file, args.checkpoint)
    attr_to_channel = extract_attr_channels(config)
    patch_size = tuple(config.autoencoder_train["patch_size"])
    transform = create_transforms(patch_size)
    reconstruction, latents, original = encode_image(args.image_path, model, variables, transform)

    if args.export or not _HAS_DASH:
        if not _HAS_DASH and not args.export:
            print("dash is not installed — exporting a static grid instead.")
        export_static_grid(original, reconstruction, latents, attr_to_channel, args.output)
        return args.output
    app = _build_dash_app(original, reconstruction, latents, attr_to_channel)  # pragma: no cover
    app.run(host=args.host, port=args.port, debug=args.debug)  # pragma: no cover


if __name__ == "__main__":
    main()
