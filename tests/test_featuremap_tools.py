"""Feature-map harness geometry: sector distortion + offset re-rendering,
parity vs direct transcriptions of the reference implementations
(`/root/reference/yolox/demo_featuremap.py:199-328`)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from eop_tpu.tools.featuremap import ImageDistortion, get_img_mask


# ---------------------------------------------------------------------------
# transcription of the reference `Image_Distortion.sector_distort`
# (demo_featuremap.py:238-328) — used as the oracle
# ---------------------------------------------------------------------------

class _RefDistortion:
    def __init__(self):
        self.draw_temp_size = 1000
        self.sector_length = self.draw_temp_size - 100
        self.draw_resolution = 80

    def sector_distort(self, image, mask, Theta=60, custom_rows=None):
        draw_temp_h = self.draw_temp_size
        draw_temp_w = int(draw_temp_h * np.sin(Theta / 2 * np.pi / 180) * 2)
        img_h, img_w, img_c = image.shape
        scale_hw = img_h / img_w
        draw_temp_img = np.ones(
            (draw_temp_h, draw_temp_w, img_c), dtype=np.uint8) * 114
        draw_temp_mask = np.zeros(
            (draw_temp_h, draw_temp_w, img_c), dtype=np.uint8)
        R_sector = self.draw_temp_size
        theta_start = (180 - Theta) / 2
        theta_sector = np.linspace(
            theta_start, theta_start + Theta, 165 * self.draw_resolution,
            True)
        rad = theta_sector * np.pi / 180
        M_rot = np.array([[np.cos(rad), -1 * np.sin(rad)],
                          [np.sin(rad), np.cos(rad)]]).transpose(2, 0, 1)
        P_end = np.array([[self.draw_temp_size], [0]])
        arc_end = np.matmul(M_rot, P_end).astype(np.int16).transpose(0, 2, 1)
        arc_uniq = arc_end[:, :, 0] + arc_end[:, :, 1] * 1j
        arc_len = np.unique(arc_uniq, return_index=True)[1].shape[0]
        if custom_rows is None:
            target_side = np.clip(
                int(arc_len * scale_hw), 0, self.sector_length)
        else:
            target_side = custom_rows
        P_x = np.linspace(R_sector - target_side, R_sector, target_side)
        P_y = np.linspace(0, 0, target_side)
        P_xy = np.array([P_x, P_y])
        new_p = np.matmul(M_rot, P_xy).astype(np.int16).transpose(0, 2, 1)
        target_w = 165 * self.draw_resolution
        img_resize = cv2.resize(image, (target_w, target_side))
        mask_resize = cv2.resize(mask, (target_w, target_side))
        idx_h = np.arange(0, target_side, 1)
        idx_w = np.arange(0, target_w, 1)
        ptx, pty = np.meshgrid(idx_h, idx_w)
        new_p[:, :, 0] = np.clip(
            ((new_p + draw_temp_w / 2)[:, :, 0] - 1), 0, draw_temp_w)
        new_p[:, :, 1] = np.clip(
            ((draw_temp_h - new_p)[:, :, 1] - 1), 0, draw_temp_h)
        ptx = ptx[:, ::-1]
        pty = pty[::-1, :]
        draw_temp_img[new_p[:, :, 1], new_p[:, :, 0]] = img_resize[ptx, pty]
        draw_temp_mask[new_p[:, :, 1], new_p[:, :, 0]] = mask_resize[
            ptx, pty]
        l_bound = np.min(new_p[:, :, 1])
        r_bound = np.max(new_p[:, :, 1])
        t_bound = np.min(new_p[:, :, 0])
        b_bound = np.max(new_p[:, :, 0])
        draw_temp_img = draw_temp_img[l_bound:r_bound, t_bound:b_bound]
        new_image = draw_temp_img.copy()
        draw_temp_mask = draw_temp_mask[l_bound:r_bound, t_bound:b_bound]
        single_mask = draw_temp_mask[:, :, 0].astype(bool)
        ys, xs = np.nonzero(single_mask)
        if len(xs) != 0:
            new_bbox = [int(xs.min()), int(ys.min()),
                        int(xs.max() - xs.min()), int(ys.max() - ys.min())]
        else:
            new_bbox = []
        return new_image, new_bbox


def _scene(seed=0):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 255, (120, 160, 3), dtype=np.uint8)
    mask = np.zeros((120, 160, 3), np.uint8)
    cv2.circle(mask, (80, 60), 25, (1, 1, 1), -1)
    return img, mask


@pytest.mark.parametrize("theta", [30, 60, 90])
def test_sector_distort_parity(theta):
    """`reference_parity=True` reproduces the reference's forward-splat
    numerics bit-for-bit (the pixel-golden mode)."""
    img, mask = _scene()
    ref_img, ref_bbox = _RefDistortion().sector_distort(
        img.copy(), mask.copy(), Theta=theta)
    our_img, our_bbox = ImageDistortion().sector_distort(
        img.copy(), mask.copy(), theta=theta, reference_parity=True)
    assert our_img.shape == ref_img.shape, (our_img.shape, ref_img.shape)
    np.testing.assert_array_equal(our_img, ref_img)
    assert our_bbox == ref_bbox


@pytest.mark.parametrize("theta", [30, 60, 90, 150])
def test_inverse_vs_splat_agreement(theta):
    """The owned inverse polar map (the default) describes the same warp
    as the reference's forward splat: identical output shape (shared
    int16 crop bounds), near-identical content where the splat actually
    wrote pixels, close mask bboxes — while being dense (the splat
    leaves unwritten gray holes between radial runs; the inverse map has
    none inside the sector)."""
    # smooth source: bilinear (inverse) and nearest (splat) resampling
    # agree up to the local gradient, so content comparison is meaningful
    yy, xx = np.mgrid[0:120, 0:160]
    # channel 0 stays >= 130 so no resampled value (bilinear = convex
    # combination) can ever collide with the 114 background marker
    img = np.stack([
        130 + xx * 100 / 159, yy * 255 / 119, (xx + yy) * 255 / 278
    ], axis=-1).astype(np.uint8)
    _, mask = _scene()
    splat_img, splat_bbox = ImageDistortion().sector_distort(
        img.copy(), mask.copy(), theta=theta, reference_parity=True)
    inv_img, inv_bbox = ImageDistortion().sector_distort(
        img.copy(), mask.copy(), theta=theta)
    assert inv_img.shape == splat_img.shape, (
        inv_img.shape, splat_img.shape)
    # compare on pixels the splat wrote (not its 114 background/holes)
    written = np.any(splat_img != 114, axis=-1)
    assert written.mean() > 0.2, written.mean()
    diff = np.abs(inv_img.astype(int) - splat_img.astype(int)).max(-1)
    close = (diff[written] <= 8)
    assert close.mean() > 0.97, close.mean()
    # mask bbox: same object described (within a few px of resampling)
    assert splat_bbox and inv_bbox
    np.testing.assert_allclose(inv_bbox, splat_bbox, atol=4)
    # and the inverse map is dense: in the sector INTERIOR (written
    # region eroded 3 px so the boundary band — where the splat's int16
    # truncation scatters up to ~2 px past the nominal sector edge — is
    # excluded) the inverse map leaves zero unwritten pixels, while the
    # splat leaves holes between its radial runs
    interior = cv2.erode(written.astype(np.uint8),
                         np.ones((7, 7), np.uint8)).astype(bool)
    holes_inv = np.all(inv_img == 114, axis=-1)
    assert interior.sum() > 1000
    assert holes_inv[interior].sum() == 0, holes_inv[interior].sum()


def test_get_img_mask_offsets():
    """Offset re-rendering: object pixels move by exactly the offset and
    the background stays gray."""
    from eop_tpu.data.coco_api import COCO, mask_to_rle

    img = np.zeros((100, 100, 3), np.uint8)
    img[:] = 30
    mask = np.zeros((100, 100), np.uint8)
    mask[40:60, 20:50] = 1
    img[mask.astype(bool)] = 200

    coco = COCO()
    coco.dataset = {
        "images": [{"id": 1, "width": 100, "height": 100,
                    "file_name": "x.jpg"}],
        "annotations": [{
            "id": 1, "image_id": 1, "category_id": 1,
            "bbox": [20.0, 40.0, 30.0, 20.0], "area": 600.0,
            "iscrowd": 0, "segmentation": mask_to_rle(mask),
        }],
        "categories": [{"id": 1, "name": "a"}],
    }
    coco.createIndex()
    targets = coco.loadAnns([1])

    for offset in (-20, 0, 20):
        canvas, gt_fm, gt_px, m = get_img_mask(
            offset, img, 100, 100, targets, coco)
        # object pixels present at the shifted rows
        assert (canvas[40 + offset: 60 + offset, 20:50] == 200).all()
        # elsewhere gray 114
        assert (canvas[0:10, 0:10] == 114).all()
        assert gt_px[0].tolist() == [20.0, 40.0 + offset, 50.0,
                                     60.0 + offset]
