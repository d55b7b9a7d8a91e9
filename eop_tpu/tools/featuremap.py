"""Feature-map exploration harness: offset re-rendering, sector (fisheye)
distortion, FPN heatmap statistics, per-distortion COCO AP.

Parity target: `/root/reference/yolox/demo_featuremap.py` (620 lines) — the
"exploration of the potential of feature maps" study:

* ``get_img_mask`` — re-render the annotated objects of one COCO image
  onto a gray canvas at vertical offsets −100..+100 (step 50) (`:199-236`);
* ``ImageDistortion.sector_distort`` — map the image onto an annulus
  sector of angle Θ (fisheye-like warp) and recompute the mask bbox
  (`:238-328`);
* ``create_2d_feature_map`` — per-scale channel-mean FPN heatmaps with
  pred/GT box overlays and **per-GT mean activation** statistics
  (`:330-392`);
* ``undistorted_sweep`` / ``distorted_sweep`` — per-offset (and per-Θ for
  30..90 step 5) COCO gt/dt json creation + AP (`:443-588`);
* a final per-FPN-scale activation table (`:613-620`).

TPU adaptations: the model handle is a jitted forward returning decoded
predictions AND the 6-tuple FPN outputs (NHWC); the per-pixel python mask
loop of `get_img_mask` is a boolean scatter; AP uses the framework's own
COCOeval.  The sector warp keeps the reference's forward-splat numerics
(int16 truncation + complex-number dedup) for output parity.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import cv2
import numpy as np

from ..data.coco_api import COCO
from ..eval.coco_eval import COCOeval


def get_img_info(json_file: str, image_dir: Optional[str] = None):
    """Load the single-image COCO fixture (ref `get_img_info:183-197`)."""
    coco = COCO(annotation_file=json_file)
    ids = sorted(coco.imgs.keys())
    img_id = ids[0]
    targets = coco.loadAnns(coco.getAnnIds(imgIds=img_id))
    image_name = coco.loadImgs(img_id)[0]["file_name"]
    candidates = [
        os.path.join(image_dir or "", image_name),
        os.path.join(os.path.dirname(json_file), image_name),
        os.path.join(os.path.dirname(os.path.dirname(json_file)),
                     image_name),
    ]
    image = None
    for path in candidates:
        if path and os.path.exists(path):
            image = cv2.imread(path)
            break
    assert image is not None, f"fixture image {image_name} not found"
    return coco, targets, image, image.shape[0], image.shape[1]


def get_img_mask(offset, ori_img, ori_img_h, ori_img_w, targets, coco,
                 frame: int = 640):
    """Re-render annotated objects at a vertical offset on a gray canvas
    (ref `get_img_mask:199-236`).  Returns (canvas, gt boxes normalized to
    the ``frame``-letterbox frame (the reference hardcodes 640), gt boxes
    in pixels, last shifted mask)."""
    draw_temp = np.ones((ori_img_h, ori_img_w, 3), dtype=np.uint8) * 114
    gt_box_fm = np.zeros((len(targets), 4))
    gt_box = np.zeros((len(targets), 4))

    r = min(frame / ori_img_h, frame / ori_img_w)
    new_w = int(ori_img_w * r)
    new_h = int(ori_img_h * r)

    m_shifted = None
    for idx, target in enumerate(targets):
        x, y, w, h = target["bbox"]
        gt_box_fm[idx] = (
            (x / ori_img_w) * new_w / frame,
            ((y + offset) / ori_img_h) * new_h / frame,
            ((x + w) / ori_img_w) * new_w / frame,
            ((y + offset + h) / ori_img_h) * new_h / frame,
        )
        gt_box[idx] = (x, y + offset, x + w, y + offset + h)

        m = coco.annToMask(target)
        # shift the mask vertically by `offset`, zero-filling
        m_shift = np.zeros_like(m)
        if offset < 0:
            m_shift[: ori_img_h + offset] = m[-offset:]
        elif offset > 0:
            m_shift[offset:] = m[: ori_img_h - offset]
        else:
            m_shift = m.copy()
        # scatter the object's pixels at the shifted location
        ys, xs = np.nonzero(m)
        ys_dst = ys + offset
        keep = (ys_dst >= 0) & (ys_dst < ori_img_h)
        draw_temp[ys_dst[keep], xs[keep]] = ori_img[ys[keep], xs[keep]]
        m_shifted = m_shift[..., None].repeat(3, axis=2)

    return draw_temp, gt_box_fm, gt_box, m_shifted


class ImageDistortion:
    """Sector/fisheye warp: map a flat image onto an annulus sector of
    angle Θ (ref `Image_Distortion:238-328`).

    Two formulations of the same geometry:

    * **inverse polar map (default)** — for every destination pixel in
      the sector, compute its polar coordinates ``(r, φ)`` about the
      sector apex and sample the source at the radially/angularly
      proportional position (bilinear for the image, nearest for the
      mask).  This is the owned re-derivation: dense (no splat holes
      between radial runs), properly filtered, and a direct statement of
      the warp's definition.
    * **forward splat (``reference_parity=True``)** — the reference's
      numerics: rotate each radial source run by each arc angle, int16-
      truncate, and scatter.  Kept verbatim because the pixel goldens
      (tests/test_featuremap_golden.py) compare bit-for-bit against the
      reference's own code, truncation quirks and all.

    Both share the sector parameterization (apex at the bottom-center of
    a 1000-px canvas, sector symmetric about the vertical, outer radius
    1000, radial depth = outer-arc pixel count x the source aspect) and
    the same int16 crop bounds, so their outputs have identical shapes;
    interior pixels differ only by resampling (measured: >97% of pixels
    within ±1 intensity step, mask bboxes within 2 px — pinned by
    tests/test_featuremap_tools.py::test_inverse_vs_splat_agreement).
    """

    def __init__(self):
        self.draw_temp_size = 1000
        self.sector_length = self.draw_temp_size - 100
        self.draw_resolution = 80

    def _geometry(self, theta: float, scale_hw: float,
                  custom_rows: Optional[int]):
        """Shared sector parameters: canvas width, start angle, arc
        sample count, and the radial row count (the outer arc's length in
        deduplicated int16 pixels, scaled by the source aspect — the
        reference's measure of how many radial rows the arc supports)."""
        assert 15 <= theta <= 180, "Theta is not in range 15°-180°!"
        draw_temp_h = self.draw_temp_size
        draw_temp_w = int(draw_temp_h * np.sin(theta / 2 * np.pi / 180) * 2)
        theta_start = (180 - theta) / 2
        target_w = 165 * self.draw_resolution
        rad = np.linspace(theta_start, theta_start + theta, target_w,
                          True) * np.pi / 180
        arc_x = (draw_temp_h * np.cos(rad)).astype(np.int16)
        arc_y = (draw_temp_h * np.sin(rad)).astype(np.int16)
        arc_len = np.unique(arc_x + 1j * arc_y).shape[0]
        if custom_rows is None:
            target_side = int(
                np.clip(int(arc_len * scale_hw), 0, self.sector_length)
            )
        else:
            assert custom_rows <= self.sector_length
            target_side = custom_rows
        return draw_temp_h, draw_temp_w, theta_start, target_w, target_side

    def _crop_bounds(self, draw_temp_h, draw_temp_w, theta_start, theta,
                     target_w, target_side):
        """The forward splat's crop bounds, computed on the two extreme
        radial rows only (grid extremes lie on the boundary), with the
        same int16 truncation — keeps both formulations' output shapes
        identical."""
        rad = np.linspace(theta_start, theta_start + theta, target_w,
                          True) * np.pi / 180
        r_sector = float(self.draw_temp_size)
        radii = np.array([r_sector - target_side, r_sector])[:, None]
        px = (radii * np.cos(rad)).astype(np.int16)
        py = (radii * np.sin(rad)).astype(np.int16)
        x = np.clip(
            (px + draw_temp_w / 2) - 1, 0, draw_temp_w
        ).astype(np.int16)
        y = np.clip(
            (draw_temp_h - py) - 1, 0, draw_temp_h
        ).astype(np.int16)
        return int(y.min()), int(y.max()), int(x.min()), int(x.max())

    def sector_distort(self, image, mask, theta: float = 60,
                       custom_rows: Optional[int] = None,
                       reference_parity: bool = False):
        """Warp ``image`` onto an annulus sector of angle ``theta``.

        Returns (warped image, mask bbox [x, y, w, h] in the warped frame).
        """
        if reference_parity:
            return self._sector_distort_splat(image, mask, theta,
                                              custom_rows)
        img_h, img_w, img_c = image.shape
        (draw_temp_h, draw_temp_w, theta_start, target_w,
         target_side) = self._geometry(theta, img_h / img_w, custom_rows)
        l_b, r_b, t_b, b_b = self._crop_bounds(
            draw_temp_h, draw_temp_w, theta_start, theta, target_w,
            target_side,
        )

        img_resize = cv2.resize(image, (target_w, target_side))
        mask_resize = cv2.resize(mask, (target_w, target_side))

        # destination pixels of the cropped window -> polar coords about
        # the sector apex (bottom-center of the canvas; the forward splat
        # lands int16(r cosφ) at column +w/2-1 and int16(r sinφ) at row
        # h-1-·, so the apex sits at (w/2-1, h-1))
        ys, xs = np.mgrid[l_b:r_b, t_b:b_b].astype(np.float32)
        xr = xs - (draw_temp_w / 2 - 1)
        yr = (draw_temp_h - 1) - ys
        r = np.hypot(xr, yr)
        ang = np.degrees(np.arctan2(yr, xr))

        # radial index s: source radius p_x[s] = (h - S) + s*S/(S-1);
        # arc index c spans the theta range over target_w samples; the
        # splat reverses both source axes (top row -> outer radius,
        # first column -> last arc angle)
        r0 = draw_temp_h - target_side
        s = (r - r0) * (target_side - 1) / target_side
        c = (ang - theta_start) * (target_w - 1) / theta
        src_row = (target_side - 1) - s
        src_col = (target_w - 1) - c
        inside = (
            (r >= r0 - 0.5) & (r <= draw_temp_h + 0.5)
            & (ang >= theta_start) & (ang <= theta_start + theta)
        )
        map_x = np.where(inside, src_col, -10.0).astype(np.float32)
        map_y = np.where(inside, src_row, -10.0).astype(np.float32)
        new_image = cv2.remap(
            img_resize, map_x, map_y, cv2.INTER_LINEAR,
            borderMode=cv2.BORDER_CONSTANT, borderValue=(114, 114, 114),
        )
        warped_mask = cv2.remap(
            mask_resize, map_x, map_y, cv2.INTER_NEAREST,
            borderMode=cv2.BORDER_CONSTANT, borderValue=0,
        )

        single = (warped_mask[:, :, 0] if warped_mask.ndim == 3
                  else warped_mask).astype(bool)
        mys, mxs = np.nonzero(single)
        if len(mxs) != 0:
            new_bbox = [
                int(mxs.min()), int(mys.min()),
                int(mxs.max() - mxs.min()), int(mys.max() - mys.min()),
            ]
        else:
            new_bbox = []
        return new_image, new_bbox

    def _sector_distort_splat(self, image, mask, theta: float = 60,
                              custom_rows: Optional[int] = None):
        """The reference's forward-splat numerics (`:238-328`): int16
        truncation, scatter with last-write-wins, splat holes left gray.
        Retained verbatim for the bit-exact pixel goldens."""
        draw_temp_h = self.draw_temp_size
        draw_temp_w = int(draw_temp_h * np.sin(theta / 2 * np.pi / 180) * 2)

        img_h, img_w, img_c = image.shape
        scale_hw = img_h / img_w

        draw_img = np.ones((draw_temp_h, draw_temp_w, img_c),
                           dtype=np.uint8) * 114
        draw_mask = np.zeros((draw_temp_h, draw_temp_w, img_c),
                             dtype=np.uint8)

        assert 15 <= theta <= 180, "Theta is not in range 15°-180°!"
        theta_start = (180 - theta) / 2
        theta_sector = np.linspace(
            theta_start, theta_start + theta,
            165 * self.draw_resolution, True,
        )
        rad = theta_sector * np.pi / 180
        m_rot = np.array(
            [[np.cos(rad), -np.sin(rad)], [np.sin(rad), np.cos(rad)]]
        ).transpose(2, 0, 1)  # [C, 2, 2]

        # how many radial rows the arc supports (dedup the outer arc)
        p_end = np.array([[self.draw_temp_size], [0]])
        arc_end = np.matmul(m_rot, p_end).astype(np.int16).transpose(0, 2, 1)
        arc_uniq = arc_end[:, :, 0] + arc_end[:, :, 1] * 1j
        arc_len = np.unique(arc_uniq, return_index=True)[1].shape[0]
        if custom_rows is None:
            target_side = int(
                np.clip(int(arc_len * scale_hw), 0, self.sector_length)
            )
        else:
            assert custom_rows <= self.sector_length
            target_side = custom_rows

        r_sector = self.draw_temp_size
        p_x = np.linspace(r_sector - target_side, r_sector, target_side)
        p_y = np.zeros(target_side)
        p_xy = np.array([p_x, p_y])  # [2, S]

        new_p = np.matmul(m_rot, p_xy).astype(np.int16).transpose(0, 2, 1)
        # [C, S, 2]: for each arc column, the radial run of pixel coords

        target_w = 165 * self.draw_resolution
        img_resize = cv2.resize(image, (target_w, target_side))
        mask_resize = cv2.resize(mask, (target_w, target_side))

        idx_h = np.arange(0, target_side, 1)
        idx_w = np.arange(0, target_w, 1)
        ptx, pty = np.meshgrid(idx_h, idx_w)

        new_p[:, :, 0] = np.clip(
            (new_p + draw_temp_w / 2)[:, :, 0] - 1, 0, draw_temp_w
        )
        new_p[:, :, 1] = np.clip(
            (draw_temp_h - new_p)[:, :, 1] - 1, 0, draw_temp_h
        )
        ptx = ptx[:, ::-1]
        pty = pty[::-1, :]

        draw_img[new_p[:, :, 1], new_p[:, :, 0]] = img_resize[ptx, pty]
        draw_mask[new_p[:, :, 1], new_p[:, :, 0]] = mask_resize[ptx, pty]

        l_bound = np.min(new_p[:, :, 1])
        r_bound = np.max(new_p[:, :, 1])
        t_bound = np.min(new_p[:, :, 0])
        b_bound = np.max(new_p[:, :, 0])
        new_image = draw_img[l_bound:r_bound, t_bound:b_bound].copy()
        cut_mask = draw_mask[l_bound:r_bound, t_bound:b_bound]

        single = cut_mask[:, :, 0].astype(bool)
        ys, xs = np.nonzero(single)
        if len(xs) != 0:
            new_bbox = [
                int(xs.min()), int(ys.min()),
                int(xs.max() - xs.min()), int(ys.max() - ys.min()),
            ]
        else:
            new_bbox = []
        return new_image, new_bbox


def create_2d_feature_map(fpn_outs, pred_rows, gt_box_fm, image_name,
                          table: Dict[str, List[float]],
                          save_path: Optional[str] = None,
                          show: bool = False,
                          figsize=(15, 8), frame: int = 640):
    """Channel-mean FPN heatmaps + per-GT activation means
    (ref `create_2D_feature_map:330-392`).  ``fpn_outs``: 3 NHWC arrays at
    strides 8/16/32; ``pred_rows``: [N, >=4] xyxy in the ``frame``
    (model-input) frame; ``gt_box_fm``: [G, 4] normalized to it."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import seaborn as sns

    fig_2d, ax_2d = plt.subplots(2, 3, figsize=figsize)
    if pred_rows is None or len(pred_rows) == 0:
        pred_rows = np.zeros((1, 7))
    pred_box = np.asarray(pred_rows)[:, :4] / frame

    per_img_results = []
    for idx in range(3):
        fpn_np = np.asarray(fpn_outs[idx])[0]          # [H, W, C]
        fpn_sum = fpn_np.mean(axis=-1)                  # channel mean
        size = fpn_np.shape[0]
        sns.heatmap(fpn_sum, ax=ax_2d[0, idx], square=True)
        sns.heatmap(fpn_sum, ax=ax_2d[1, idx], square=True)

        for box, color in ((pred_box, "blue"), (gt_box_fm, "green")):
            for cur in np.asarray(box):
                xs = size * np.array([cur[0], cur[0], cur[2], cur[2], cur[0]])
                ys = size * np.array([cur[1], cur[3], cur[3], cur[1], cur[1]])
                ax_2d[1, idx].plot(xs, ys, color=color)

        for gt in np.asarray(gt_box_fm):
            xmin, ymin = gt[0] * size, gt[1] * size
            xmax, ymax = gt[2] * size, gt[3] * size
            gt_pixel = fpn_sum[int(ymin):int(ymax), int(xmin):int(xmax)]
            denom = gt_pixel.shape[0] * gt_pixel.shape[1]
            per_img_results.append(
                float(gt_pixel.sum() / denom) if denom else float("nan")
            )

    key = os.path.basename(image_name).split(".")[0]
    table[key] = per_img_results
    if save_path:
        fig_2d.savefig(save_path, dpi=100)
    if show:
        plt.show()
    plt.close(fig_2d)
    return per_img_results


def coco_ap(gt_json_path: str, dt_json_path: str):
    """COCO AP of a distortion sweep (ref `coco_ap:578-588`)."""
    coco_gt = COCO(gt_json_path)
    with open(dt_json_path) as f:
        dts = json.load(f)
    if not dts:
        print("no detections; AP = 0")
        return np.zeros(12)
    coco_dt = coco_gt.loadRes(dts)
    e = COCOeval(coco_gt, coco_dt, "bbox")
    e.evaluate()
    e.accumulate()
    e.summarize()
    return e.stats
