"""GT-vs-synthesized image comparison suite.

Equivalent of reference ``src/pti_ldm_vae/analysis/metrics.py`` (811 LoC):
reconstruction metrics (MSE / SSIM / PSNR), segmentation overlap on derived
binary masks (Dice / IoU; pred mask = |x| > 0.2 + largest contour,
``metrics.py:143-168``), VGG16 feature cosine/euclidean similarity
(``:211-227,428-436``), ellipse-fit straightening (``:281-310``),
bottom-20%-center alignment (``:229-279``), object height/width-at-thirds
(``:312-343``), multi-method outlier counting (``:484-541``), CSV reports and
distribution plots (``:620-811``).

Implementation notes:

* SSIM reproduces scikit-image's ``structural_similarity`` defaults (7x7
  uniform window, unbiased covariance, edge crop) via scipy — skimage itself
  isn't shipped in this environment,
* VGG16 features run through a JAX forward (``models/lpips`` style): converted
  IMAGENET1K_V1 weights load from ``$PTI_VGG16_WEIGHTS``/packaged npz when
  available, otherwise a deterministic random init is used (documented
  divergence — relative comparisons remain meaningful, absolute values are
  not ImageNet-calibrated),
* geometry uses OpenCV like the reference (cv2 is available here).
"""

from __future__ import annotations

import os
import random
import traceback
from typing import Any

import cv2
import numpy as np
from scipy.ndimage import uniform_filter
from scipy.spatial.distance import chebyshev, cityblock, euclidean, minkowski

import jax
import jax.numpy as jnp

from ..data.io import read_image

__all__ = ["ImageComparison", "skimage_ssim", "vgg16_features_fn"]


def skimage_ssim(im1: np.ndarray, im2: np.ndarray, data_range: float) -> float:
    """scikit-image ``structural_similarity`` (defaults: win=7, uniform
    filter, unbiased covariance, crop edges) re-implemented on scipy."""
    im1 = im1.astype(np.float64)
    im2 = im2.astype(np.float64)
    win_size = 7
    np_window = win_size ** im1.ndim
    cov_norm = np_window / (np_window - 1)
    filt = lambda x: uniform_filter(x, size=win_size)  # noqa: E731
    ux, uy = filt(im1), filt(im2)
    uxx, uyy, uxy = filt(im1 * im1), filt(im2 * im2), filt(im1 * im2)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux**2 + uy**2 + c1) * (vx + vy + c2))
    pad = (win_size - 1) // 2
    return float(s[pad:-pad, pad:-pad].mean())


# --------------------------------------------------------------- VGG16 ----
_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"]
_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def _init_vgg_params(seed: int = 0) -> list[dict]:
    rng = np.random.default_rng(seed)
    params = []
    in_ch = 3
    for item in _VGG_CFG:
        if item == "M":
            continue
        fan_in = in_ch * 9
        params.append({
            "w": (rng.standard_normal((3, 3, in_ch, item)) * np.sqrt(2.0 / fan_in)).astype(np.float32),
            "b": np.zeros((item,), dtype=np.float32),
        })
        in_ch = item
    return params


def _load_vgg_params(seed: int = 0) -> list[dict]:
    env = os.environ.get("PTI_VGG16_WEIGHTS")
    if env == "none":  # explicit opt-out (test isolation from weights/)
        candidates = []
    else:
        candidates = [
            env,
            os.path.join(os.path.dirname(__file__), "..", "..", "weights", "vgg16_features.npz"),
        ]
    for cand in candidates:
        if cand and os.path.exists(cand):
            raw = np.load(cand)
            n = len([k for k in raw.files if k.endswith("/w")])
            return [{"w": raw[f"conv{i}/w"], "b": raw[f"conv{i}/b"]} for i in range(n)]
    import logging

    logging.getLogger(__name__).warning(
        "VGG16: no pretrained weights found; ImageComparison feature "
        "similarities use DETERMINISTIC RANDOM features (not ImageNet). "
        "Convert real weights with tools/convert_vgg16_weights.py and set "
        "$PTI_VGG16_WEIGHTS or place weights/vgg16_features.npz."
    )
    return _init_vgg_params(seed)


def vgg16_features_fn():
    """Jitted VGG16 ``features`` forward: [1, 224, 224, 3] -> flat vector."""
    params = [
        {"w": jnp.asarray(p["w"]), "b": jnp.asarray(p["b"])} for p in _load_vgg_params()
    ]

    @jax.jit
    def features(x):
        h = x
        conv_idx = 0
        for item in _VGG_CFG:
            if item == "M":
                h = jax.lax.reduce_window(
                    h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
                )
            else:
                p = params[conv_idx]
                dn = jax.lax.conv_dimension_numbers(h.shape, p["w"].shape, ("NHWC", "HWIO", "NHWC"))
                h = jax.lax.conv_general_dilated(
                    h, p["w"], (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn
                ) + p["b"]
                h = jax.nn.relu(h)
                conv_idx += 1
        # torch layout flatten (NCHW) for distance parity with the reference
        return jnp.transpose(h, (0, 3, 1, 2)).reshape(-1)

    return features


class ImageComparison:
    """API parity with the reference class (``metrics.py:29-810``)."""

    def __init__(self, apply_otsu_mask: bool = False) -> None:
        self.apply_otsu_mask = apply_otsu_mask
        self._vgg_features = vgg16_features_fn()
        self.worst_metrics: dict[str, tuple[float, Any]] = {}

    # -- IO -------------------------------------------------------------
    def _to_2d(self, img: np.ndarray) -> np.ndarray:
        img = np.squeeze(np.asarray(img))
        if img.ndim == 3 and img.shape[-1] == 1:
            img = img[..., 0]
        if img.ndim != 2:
            raise ValueError(f"Image must be 2D after squeeze, got shape {img.shape}")
        return img.astype(np.float32)

    def get_image_pair(self, image_path: str):
        """GT from ``edente/``, prediction from ``edente_synth/`` with the
        same filename (reference ``metrics.py:75-114``)."""
        norm = os.path.normpath(image_path)
        parts = norm.split(os.sep)
        if "edente_synth" in parts:
            idx = parts.index("edente_synth")
            pred_path = norm
            parts[idx] = "edente"
            gt_path = os.sep.join(parts)
        elif "edente" in parts:
            idx = parts.index("edente")
            gt_path = norm
            parts[idx] = "edente_synth"
            pred_path = os.sep.join(parts)
        else:
            raise ValueError("get_image_pair expects path containing 'edente' or 'edente_synth'.")
        if not os.path.isfile(gt_path):
            raise FileNotFoundError(f"Ground truth file missing: {gt_path}")
        if not os.path.isfile(pred_path):
            raise FileNotFoundError(f"Prediction file missing: {pred_path}")
        return self._to_2d(read_image(gt_path)), self._to_2d(read_image(pred_path)), None

    def get_all_files_from_folders(self, folder_paths, file_selection_mode="all", n=None):
        all_paths = []
        for folder in folder_paths:
            for root, _, files in os.walk(folder):
                all_paths.extend(os.path.join(root, f) for f in files)
        if file_selection_mode == "random_n" and n is not None:
            all_paths = random.sample(all_paths, min(n, len(all_paths)))
        elif file_selection_mode == "last_n" and n is not None:
            all_paths = all_paths[-n:]
        return all_paths

    # -- masks / overlap -------------------------------------------------------
    def generate_clean_mask(self, image: np.ndarray, kind: str = "gt") -> np.ndarray:
        """GT: nonzero. Pred: |x| > 0.2, then largest contour only
        (reference ``metrics.py:143-168``)."""
        if kind == "gt":
            mask = (image != 0).astype(np.uint8)
        else:
            mask = ((image > 0.2) | (image < -0.2)).astype(np.uint8)
            contours, _ = cv2.findContours(mask, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
            if contours:
                biggest = max(contours, key=cv2.contourArea)
                cleaned = np.zeros_like(mask)
                cv2.drawContours(cleaned, [biggest], -1, color=1, thickness=-1)
                mask = cleaned
        return (mask * 255).astype(np.uint8)

    def dice_coefficient(self, prediction, gt, smooth: float = 1e-6) -> float:
        pred_bin = self.generate_clean_mask(prediction, kind="pred").flatten() / 255.0
        gt_bin = self.generate_clean_mask(gt, kind="gt").flatten() / 255.0
        intersection = np.sum(pred_bin * gt_bin)
        union = np.sum(pred_bin) + np.sum(gt_bin)
        return float((2.0 * intersection + smooth) / (union + smooth))

    def iou(self, prediction, gt) -> float:
        pred_bin = self.generate_clean_mask(prediction, kind="pred").flatten() / 255.0
        gt_bin = self.generate_clean_mask(gt, kind="gt").flatten() / 255.0
        intersection = np.sum(pred_bin * gt_bin)
        union = np.sum((pred_bin + gt_bin) > 0)
        return 1.0 if union == 0 else float(intersection / union)

    # -- features -------------------------------------------------------------
    def extract_features(self, image: np.ndarray) -> np.ndarray:
        """Min-max -> uint8 -> RGB -> 224 resize -> ImageNet normalize ->
        VGG16 features (reference ``metrics.py:211-227``)."""
        image_uint8 = cv2.normalize(image, None, 0, 255, cv2.NORM_MINMAX).astype(np.uint8)
        rgb = cv2.cvtColor(image_uint8, cv2.COLOR_GRAY2RGB)
        resized = cv2.resize(rgb, (224, 224), interpolation=cv2.INTER_LINEAR)
        x = resized.astype(np.float32) / 255.0
        x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
        return np.asarray(self._vgg_features(jnp.asarray(x[None])))

    # -- geometry -------------------------------------------------------------
    def align_images_by_bottom_20_center(self, image1, image2, verbosity=False):
        """Shift image2 so the bottom-20% mask centers line up
        (reference ``metrics.py:229-279``)."""
        if image1.shape != image2.shape:
            raise ValueError("Images do not have the same dimensions. Resize them to match.")

        def bottom_center(image):
            height = image.shape[0]
            region = self.generate_clean_mask(image, kind="gt")[-int(height * 0.2):, :]
            cols = np.column_stack(np.where(region == 255))
            return int(np.mean(cols[:, 1])) if len(cols) else None

        c1, c2 = bottom_center(image1), bottom_center(image2)
        if c1 is None or c2 is None:
            raise ValueError("Could not find white pixels in bottom 20% of one or both images.")
        shift = c1 - c2
        if shift > 0:
            out = np.zeros_like(image2)
            out[:, shift:] = image2[:, :-shift]
        elif shift < 0:
            out = np.zeros_like(image2)
            out[:, :shift] = image2[:, -shift:]
        else:
            out = image2.copy()
        return out

    def straighten_image(self, image, verbosity=False):
        """Ellipse-fit rotation (reference ``metrics.py:281-310``)."""
        binary = self.generate_clean_mask(image, kind="gt")
        contours, _ = cv2.findContours(binary, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
        if not contours:
            raise ValueError("No contours found in the image.")
        contour = max(contours, key=cv2.contourArea)
        if len(contour) < 5:
            raise ValueError("Not enough points to fit an ellipse.")
        angle = cv2.fitEllipse(contour)[2]
        if angle > 90:
            angle -= 180
        h, w = image.shape[:2]
        rot = cv2.getRotationMatrix2D((w // 2, h // 2), angle, 1.0)
        return cv2.warpAffine(image, rot, (w, h), flags=cv2.INTER_CUBIC,
                              borderMode=cv2.BORDER_REPLICATE)

    def compute_object_dimensions(self, binary_image):
        """(height, width_upper, width_middle, width_lower)
        (reference ``metrics.py:312-343``)."""
        contours, _ = cv2.findContours(binary_image, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
        if not contours:
            raise ValueError("No contours found in the binary image.")
        x, y, w, h = cv2.boundingRect(max(contours, key=cv2.contourArea))
        rows = (y + h // 4, y + h // 2, y + 3 * h // 4)
        widths = [int(np.sum(binary_image[r, x : x + w] == 255)) for r in rows]
        return h, widths[0], widths[1], widths[2]

    def compute_height_width_metrics(self, gt_img, gen_img) -> dict[str, float]:
        gt_dims = self.compute_object_dimensions(self.generate_clean_mask(gt_img, "gt"))
        gen_dims = self.compute_object_dimensions(self.generate_clean_mask(gen_img, "pred"))
        names = ("height", "width_upper", "width_middle", "width_lower")
        out: dict[str, float] = {}
        for name, a, b in zip(names, gt_dims, gen_dims):
            key = "height_metric" if name == "height" else f"width_metric_{name.split('_')[1]}"
            out[key] = min(a, b) / max(a, b) if max(a, b) else 1.0
            diff_key = ("abs_height_diff" if name == "height"
                        else f"abs_{name}_diff")
            out[diff_key] = abs(a - b)
        return out

    def calculate_psnr(self, gt_img, gen_img) -> float:
        mse = float(np.mean((np.asarray(gt_img, np.float64) - np.asarray(gen_img, np.float64)) ** 2))
        if mse == 0:
            return float("inf")
        pixel_max = max(float(np.max(gt_img)), float(np.max(gen_img)))
        return float(20 * np.log10(pixel_max / np.sqrt(mse)))

    # -- full comparison ---------------------------------------------------------
    _HIGHER_BETTER = {
        "SSIM", "PSNR", "Dice Coefficient", "Cosine Similarity", "IoU",
        "Height Metric", "Width Metric Upper", "Width Metric Middle", "Width Metric Lower",
    }

    def compare_images_and_display_metrics(self, gt_img, gen_img, original_image=None):
        """All metrics for one pair (reference ``metrics.py:400-482``)."""
        if gen_img.shape != gt_img.shape:
            raise ValueError("Images do not have the same dimensions. Resize them to match.")
        mse_value = float(np.mean((gen_img.astype(np.float64) - gt_img.astype(np.float64)) ** 2))
        ssim_value = skimage_ssim(gen_img, gt_img, data_range=float(gt_img.max() - gt_img.min()))
        psnr_value = self.calculate_psnr(gt_img, gen_img)
        dice_value = self.dice_coefficient(gen_img, gt_img)
        iou_value = self.iou(gen_img, gt_img)

        f_gen = self.extract_features(gen_img)
        f_gt = self.extract_features(gt_img)
        cos = float(np.dot(f_gen, f_gt) / (np.linalg.norm(f_gen) * np.linalg.norm(f_gt) + 1e-12))
        eucl = round(float(euclidean(f_gen, f_gt)), 2)
        cityblock(f_gen, f_gt)
        chebyshev(f_gen, f_gt)
        minkowski(f_gen, f_gt, p=3)

        hw = self.compute_height_width_metrics(gt_img, gen_img)
        metrics = {
            "MSE": mse_value,
            "SSIM": ssim_value,
            "PSNR": psnr_value,
            "Dice Coefficient": dice_value,
            "Dice Loss": 1 - dice_value,
            "IoU": iou_value,
            "Cosine Similarity": cos,
            "Euclidean Distance": eucl,
            "Height Metric": hw["height_metric"],
            "Width Metric Upper": hw["width_metric_upper"],
            "Width Metric Middle": hw["width_metric_middle"],
            "Width Metric Lower": hw["width_metric_lower"],
            "Absolute Height Difference": hw["abs_height_diff"],
            "Absolute Width Upper Difference": hw["abs_width_upper_diff"],
            "Absolute Width Middle Difference": hw["abs_width_middle_diff"],
            "Absolute Width Lower Difference": hw["abs_width_lower_diff"],
        }
        for name, value in metrics.items():
            if name not in self.worst_metrics:
                self.worst_metrics[name] = (value, original_image)
            elif name in self._HIGHER_BETTER:
                if value < self.worst_metrics[name][0]:
                    self.worst_metrics[name] = (value, original_image)
            elif value > self.worst_metrics[name][0]:
                self.worst_metrics[name] = (value, original_image)
        return metrics

    # -- aggregates --------------------------------------------------------------
    def count_outliers(self, all_metrics, metrics_avg, metrics_ci95):
        """CI / IQR / z-score outlier counts (reference ``metrics.py:484-541``)."""
        counts = {k: {} for k in
                  ("outside_1_ci", "outside_2_ci", "outside_3_ci", "outside_iqr", "outside_z")}
        for key in metrics_avg:
            data = np.array([m[key] for m in all_metrics], dtype=np.float64)
            mean = metrics_avg[key]
            std = np.std(data)
            ci_lower, ci_upper = metrics_ci95[key]
            margin = (ci_upper - ci_lower) / 2
            z = (data - mean) / std if std else np.zeros_like(data)
            q1, q3 = np.percentile(data, [25, 75])
            iqr = q3 - q1
            counts["outside_z"][key] = int(np.sum(np.abs(z) > 3))
            counts["outside_iqr"][key] = int(
                np.sum((data < q1 - 1.5 * iqr) | (data > q3 + 1.5 * iqr))
            )
            counts["outside_1_ci"][key] = int(np.sum((data < ci_lower) | (data > ci_upper)))
            counts["outside_2_ci"][key] = int(
                np.sum((data < mean - 2 * margin) | (data > mean + 2 * margin))
            )
            counts["outside_3_ci"][key] = int(
                np.sum((data < mean - 3 * margin) | (data > mean + 3 * margin))
            )
        return counts

    def plot_metric_distributions_with_ci(self, all_metrics, metrics_avg, metrics_ci95,
                                          save_path=None):
        """Histogram panels with CI/IQR/z-score annotations
        (reference ``metrics.py:543-618``)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        exclude = {"Euclidean Distance", "Manhattan Distance", "Chebyshev Distance",
                   "Minkowski Distance"}
        keys = [k for k in metrics_avg if k not in exclude]
        num_cols = 3
        num_rows = -(-len(keys) // num_cols)
        fig, axes = plt.subplots(num_rows, num_cols, figsize=(15, num_rows * 4))
        axes = np.atleast_1d(axes).flatten()
        for idx, key in enumerate(keys):
            data = np.array([m[key] for m in all_metrics], dtype=np.float64)
            mean = metrics_avg[key]
            std = np.std(data)
            q1, q3 = np.percentile(data, [25, 75])
            iqr = q3 - q1
            ax = axes[idx]
            ax.hist(data, bins=20, color="lightblue", edgecolor="black", alpha=0.7)
            ax.axvline(mean, color="red", linestyle="--", label="Mean", lw=2)
            ax.axvline(q1 - 1.5 * iqr, color="orange", linestyle="-", label="IQR Lower", lw=2)
            ax.axvline(q3 + 1.5 * iqr, color="orange", linestyle="-", label="IQR Upper", lw=2)
            ax.axvline(mean - 3 * std, color="red", linestyle="-", label="Z-Score -3", lw=2)
            ax.axvline(mean + 3 * std, color="red", linestyle="-", label="Z-Score +3", lw=2)
            ax.set_title(f"Distribution of {key}", fontsize=12)
            ax.legend(loc="upper left", fontsize=8)
        for i in range(len(keys), len(axes)):
            fig.delaxes(axes[i])
        plt.tight_layout()
        if save_path:
            plt.savefig(save_path)
        plt.close(fig)

    def process_all_images(self, folder_paths, file_selection_mode="all", n=None,
                           verbose=False, save_csv=False):
        """Full pipeline over ``edente``/``edente_synth`` pairs
        (reference ``metrics.py:620-810``): clean -> straighten -> align ->
        dimensions + metrics -> aggregates, threshold counters, CSV, plots."""
        import pandas as pd

        all_metrics = []
        all_paths = self.get_all_files_from_folders(folder_paths, file_selection_mode, n)
        num_images = len(all_paths)
        thresholds = {f"{kind}_{level}": 0
                      for kind in ("height", "width") for level in (90, 95, 97)}
        rows = []
        for path in all_paths:
            try:
                gt, pred, _ = self.get_image_pair(path)
                pred = pred * (self.generate_clean_mask(pred, kind="pred") > 0)
                rot_gt = self.straighten_image(gt, verbosity=verbose)
                rot_gen = self.straighten_image(pred, verbosity=verbose)
                aligned = self.align_images_by_bottom_20_center(rot_gt, rot_gen, verbose)
                gt_dims = self.compute_object_dimensions(self.generate_clean_mask(rot_gt, "gt"))
                gen_dims = self.compute_object_dimensions(self.generate_clean_mask(aligned, "pred"))
                rows.append([os.path.basename(path), *gt_dims, *gen_dims])
                metrics = self.compare_images_and_display_metrics(rot_gt, aligned)
                all_metrics.append(metrics)
                for level in (90, 95, 97):
                    if metrics["Height Metric"] > level / 100:
                        thresholds[f"height_{level}"] += 1
                    if metrics["Width Metric Middle"] > level / 100:
                        thresholds[f"width_{level}"] += 1
            except Exception:
                num_images -= 1
                if verbose:
                    print(f"Failed to process image {path}: {traceback.format_exc()}")
                continue

        if not all_metrics:
            raise RuntimeError("No image pairs processed successfully.")

        metrics_avg = {k: float(np.mean([m[k] for m in all_metrics])) for k in all_metrics[0]}
        metrics_std = {k: float(np.std([m[k] for m in all_metrics])) for k in all_metrics[0]}
        metrics_ci95 = {
            k: (metrics_avg[k] - 1.96 * metrics_std[k] / np.sqrt(num_images),
                metrics_avg[k] + 1.96 * metrics_std[k] / np.sqrt(num_images))
            for k in metrics_avg
        }
        outliers = self.count_outliers(all_metrics, metrics_avg, metrics_ci95)

        dims = pd.DataFrame(rows, columns=[
            "Image Path", "GT Height", "GT Width Upper", "GT Width Middle", "GT Width Lower",
            "Gen Height", "Gen Width Upper", "Gen Width Middle", "Gen Width Lower",
        ])
        h_diff = (dims["Gen Height"] - dims["GT Height"]).abs()
        wm_diff = (dims["Gen Width Middle"] - dims["GT Width Middle"]).abs()
        wl_diff = (dims["Gen Width Lower"] - dims["GT Width Lower"]).abs()

        if save_csv:
            out_rows = [{
                "Metric": k,
                "Average": round(metrics_avg[k], 3),
                "Worst Value": round(self.worst_metrics[k][0], 3),
                "Confidence Interval Lower (95%)": round(metrics_ci95[k][0], 3),
                "Confidence Interval Upper (95%)": round(metrics_ci95[k][1], 3),
                "Number of Images Processed": num_images,
                "Outside 1 CI": outliers["outside_1_ci"][k],
                "Outside 2 CI": outliers["outside_2_ci"][k],
                "Outside 3 CI": outliers["outside_3_ci"][k],
                "IQR Outliers": outliers["outside_iqr"][k],
                "Z-Score Outliers": outliers["outside_z"][k],
            } for k in metrics_avg]
            for name, count in [
                ("Exams with Height Metric > 0.95", thresholds["height_95"]),
                ("Exams with Width Metric > 0.95", thresholds["width_95"]),
                ("Exams with Height Metric > 0.97", thresholds["height_97"]),
                ("Exams with Width Metric > 0.97", thresholds["width_97"]),
                ("Exams with Height Metric > 0.90", thresholds["height_90"]),
                ("Exams with Width Metric > 0.90", thresholds["width_90"]),
                ("Exams with Absolute Height Difference < 5", int((h_diff < 5).sum())),
                ("Exams with Absolute Middle Width Difference < 5", int((wm_diff < 5).sum())),
                ("Exams with Absolute Lower Width Difference < 5", int((wl_diff < 5).sum())),
                ("Exams with Absolute Height Difference < 10", int((h_diff < 10).sum())),
                ("Exams with Absolute Middle Width Difference < 10", int((wm_diff < 10).sum())),
                ("Exams with Absolute Lower Width Difference < 10", int((wl_diff < 10).sum())),
            ]:
                out_rows.append({
                    "Metric": name, "Count": count,
                    "Percentage": round(count / num_images * 100, 2),
                })
            pd.DataFrame(out_rows).to_csv(f"{folder_paths[0]}/_metrics.csv", index=False, sep=";")
            dims.to_csv(f"{folder_paths[0]}/_dimensions.csv", index=False, sep=";")

        self.plot_metric_distributions_with_ci(
            all_metrics, metrics_avg, metrics_ci95,
            save_path=f"{folder_paths[0]}/_metrics_distribution.png",
        )
        return metrics_avg, metrics_ci95
