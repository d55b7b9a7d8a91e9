#!/usr/bin/env python3
"""Feature-map exploration + distortion-AP study (single-image harness).

Parity target: `/root/reference/yolox/demo_featuremap.py` — the repo's
"exploration of the potential of feature maps" experiment:

1. re-render the fixture image's objects at vertical offsets −100..+100
   (step 50) on a gray canvas ("Undistorted" sweep);
2. additionally warp each offset image through a sector/fisheye distortion
   for Θ = 30..90 step 5 ("Distorted" sweeps);
3. run the detector (CSPDarknet / VGG / ResNet / DenseNet backbone) on
   every generated image, draw FPN channel-mean heatmaps with pred/GT
   boxes, record per-GT mean activations;
4. write per-sweep COCO gt/dt jsons and report AP;
5. print the per-FPN-scale activation table.

    python tools/demo_featuremap.py -n yolox-l -c <ckpt.pth> \
        --backbone darknet --json <fixture.json>
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

IMAGE_EXT = [".jpg", ".jpeg", ".webp", ".bmp", ".png"]
DEFAULT_FIXTURE = "/root/reference/yolox/test_data/000000130566.json"


def make_parser():
    parser = argparse.ArgumentParser("eop_tpu demo_featuremap")
    parser.add_argument("-n", "--name", type=str, default="yolox-l")
    parser.add_argument("-f", "--exp_file", type=str, default=None)
    parser.add_argument("-c", "--ckpt", type=str, default=None)
    parser.add_argument("--backbone", type=str, default="darknet",
                        choices=["darknet", "vgg", "resnet", "densenet"])
    parser.add_argument("--json", type=str, default=DEFAULT_FIXTURE,
                        help="single-image COCO fixture json")
    parser.add_argument("--image-dir", type=str, default=None)
    parser.add_argument("--conf", type=float, default=None)
    parser.add_argument("--nms", type=float, default=None)
    parser.add_argument("--tsize", type=int, default=None)
    parser.add_argument("--vis", action="store_true")
    parser.add_argument("--theta-range", type=str, default="30,95,5",
                        help="start,stop,step for the sector sweep")
    parser.add_argument("--reference-parity", action="store_true",
                        help="use the reference's forward-splat warp "
                             "numerics (int16 truncation, splat holes) "
                             "instead of the default inverse polar map")
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    return parser


class Predictor:
    """Letterbox -> jitted forward (decoded preds + FPN outs) -> NMS
    (ref `Predictor:73-143`)."""

    def __init__(self, model, variables, exp, cls_names):
        import jax

        self.exp = exp
        self.cls_names = cls_names
        self.confthre = exp.test_conf
        self.nmsthre = exp.nmsthre
        self.test_size = exp.test_size

        num_classes = exp.num_classes

        @jax.jit
        def forward(imgs):
            from eop_tpu.eval.postprocess import postprocess_bbox
            from eop_tpu.models import inference_outputs

            head_outs, fpn_outs = model.apply(variables, imgs, False)
            decoded = inference_outputs(head_outs)
            dets = postprocess_bbox(
                decoded.astype(jax.numpy.float32), num_classes,
                exp.test_conf, exp.nmsthre, class_agnostic=True,
            )
            return dets, fpn_outs

        self._forward = forward

    def inference(self, img):
        import cv2
        import jax
        import jax.numpy as jnp

        from eop_tpu.data.augment import preproc

        img_info = {"id": 0}
        if isinstance(img, str):
            img_info["file_name"] = os.path.basename(img)
            img = cv2.imread(img)
        else:
            img_info["file_name"] = None
        height, width = img.shape[:2]
        img_info.update(height=height, width=width, raw_img=img)
        ratio = min(self.test_size[0] / height, self.test_size[1] / width)
        img_info["ratio"] = ratio

        padded, _ = preproc(img, self.test_size)
        t0 = time.time()
        dets, fpn_outs = self._forward(jnp.asarray(padded[None]))
        dets = jax.device_get(dets)
        fpn_outs = jax.device_get(fpn_outs)
        print(f"Infer time: {time.time() - t0:.4f}s")
        rows = dets.rows[0][dets.valid[0].astype(bool)]
        return rows, img_info, fpn_outs

    def visual(self, rows, img_info, cls_conf=0.35):
        from eop_tpu.utils.visualize import vis

        ratio = img_info["ratio"]
        img = img_info["raw_img"]
        if rows is None or len(rows) == 0:
            return img, None, None, None
        bboxes = rows[:, 0:4] / ratio
        cls = rows[:, 6]
        scores = rows[:, 4] * rows[:, 5]
        vis_res = vis(img.copy(), bboxes, scores, cls, cls_conf,
                      self.cls_names)
        return vis_res, bboxes, scores, cls


def run_sweep(predictor, data_path, dis_type, gt_boxes_fm, vis_folder,
              table_dic):
    """Run the model over every generated image of one sweep
    (ref `image_demo:145-181`)."""
    import cv2

    from eop_tpu.tools.featuremap import create_2d_feature_map

    files = sorted(
        os.path.join(data_path, f)
        for f in os.listdir(data_path)
        if os.path.splitext(f)[1] in IMAGE_EXT
    )
    names, bboxes, scores, classes = [], [], [], []
    for image_name, gt_box in zip(files, gt_boxes_fm):
        names.append(image_name)
        rows, img_info, fpn_outs = predictor.inference(image_name)
        create_2d_feature_map(
            fpn_outs[:3], rows, gt_box, image_name, table_dic,
            save_path=os.path.join(
                vis_folder,
                os.path.basename(image_name).replace(".png", "_fm.png"),
            ),
            frame=predictor.test_size[0],
        )
        result_image, bbox, score, cls = predictor.visual(
            rows, img_info, predictor.confthre
        )
        bboxes.append(bbox)
        scores.append(score)
        classes.append(cls)
        cv2.imwrite(
            os.path.join(vis_folder, os.path.basename(image_name)),
            result_image,
        )
    return names, bboxes, scores, classes


def dt_json_create(names, bboxes, scores, classes, path, id_trans):
    """Detections -> COCO dt json (ref `dt_json_create:544-576`)."""
    json_results = []
    for name, bbox, score, cls in zip(names, bboxes, scores, classes):
        if bbox is None or score is None or cls is None:
            continue
        for j in range(len(bbox)):
            xmin, ymin, xmax, ymax = (np.float64(v) for v in bbox[j][:4])
            image_id = int(os.path.basename(name).split("_")[1])
            json_results.append(
                {
                    "image_id": image_id,
                    "category_id": id_trans[int(cls[j])],
                    "bbox": [xmin, ymin, xmax - xmin, ymax - ymin],
                    "score": np.float64(score[j]),
                }
            )
    dt_path = os.path.join(path, "dt.json")
    with open(dt_path, "w", newline="\n") as f:
        f.write(json.dumps(json_results, indent=1))
    return dt_path


def main():
    from tabulate import tabulate

    from eop_tpu.data.coco_classes import COCO_CLASSES
    from eop_tpu.data.labels24p import COCO_ID2IDX
    from eop_tpu.exp import get_exp
    from eop_tpu.tools.featuremap import (
        ImageDistortion,
        coco_ap,
        get_img_info,
        get_img_mask,
    )

    args = make_parser().parse_args()
    exp = get_exp(args.exp_file, args.name)
    if args.opts:
        exp.merge(args.opts)
    if args.conf is not None:
        exp.test_conf = args.conf
    if args.nms is not None:
        exp.nmsthre = args.nms
    if args.tsize is not None:
        exp.test_size = (args.tsize, args.tsize)

    id_trans = {v: k for k, v in COCO_ID2IDX.items()}  # 0-79 -> COCO ids

    table_dic = {}
    new_data_path = os.path.join(exp.output_dir, "new_data")
    vis_folder = os.path.join(
        exp.output_dir, f"{exp.exp_name}_{args.backbone}", "vis_res"
    )
    dt_folder = os.path.join(
        exp.output_dir, f"{exp.exp_name}_{args.backbone}", "dt_json"
    )
    for d in (new_data_path, vis_folder, dt_folder):
        os.makedirs(d, exist_ok=True)

    coco, targets, ori_img, ori_h, ori_w = get_img_info(
        args.json, args.image_dir
    )

    # ---- model ----
    import jax
    import jax.numpy as jnp

    from eop_tpu.models import init_model
    from eop_tpu.utils.model_utils import get_model_info

    model = exp.get_model(args.backbone)
    variables = init_model(
        model, jax.random.PRNGKey(0),
        jnp.zeros((1, exp.test_size[0], exp.test_size[1], 3), jnp.float32),
        on_host=True,
    )
    if args.ckpt:
        from eop_tpu.train.checkpoint import load_eval_variables

        variables = load_eval_variables(args.ckpt, variables)
    print("Model Summary:",
          get_model_info(model, variables, exp.test_size))
    predictor = Predictor(model, variables, exp, COCO_CLASSES)

    first_cat = targets[0]["category_id"]
    t0, t1, tstep = (int(x) for x in args.theta_range.split(","))

    def build_gt_json(data_path, entries):
        after = {
            "images": [], "annotations": [],
            "categories": [
                {"id": cid, "name": str(cid)} for cid in id_trans.values()
            ],
        }
        for i, (img_id, h, w, bbox) in enumerate(entries, start=1):
            after["images"].append(
                {"height": int(h), "width": int(w), "id": int(img_id)}
            )
            after["annotations"].append(
                {
                    "area": float(bbox[2] * bbox[3]),
                    "iscrowd": targets[0].get("iscrowd", 0),
                    "image_id": int(img_id),
                    "bbox": [float(v) for v in bbox],
                    "category_id": first_cat,
                    "id": int(i),
                }
            )
        gt_path = os.path.join(data_path, "gt.json")
        with open(gt_path, "w", newline="\n") as f:
            f.write(json.dumps(after, indent=1))
        return gt_path

    def sweep(dis_type, theta=None):
        data_path = os.path.join(new_data_path, dis_type)
        os.makedirs(data_path, exist_ok=True)
        vis_path = os.path.join(vis_folder, dis_type)
        os.makedirs(vis_path, exist_ok=True)
        gt_boxes_fm, entries = [], []
        import cv2

        for offset in range(-100, 150, 50):
            canvas, gt_box_fm, gt_box, mask = get_img_mask(
                offset, ori_img, ori_h, ori_w, targets, coco,
                frame=exp.test_size[0],
            )
            if theta is None:
                out_img = canvas
                bbox = [
                    float(gt_box[0, 0]), float(gt_box[0, 1]),
                    float(gt_box[0, 2] - gt_box[0, 0]),
                    float(gt_box[0, 3] - gt_box[0, 1]),
                ]
                gt_boxes_fm.append(gt_box_fm)
            else:
                out_img, dis_label = ImageDistortion().sector_distort(
                    canvas, mask, theta=theta,
                    reference_parity=args.reference_parity,
                )
                if not dis_label:
                    dis_label = [0, 0, 1, 1]
                # frame = the model input size (the reference hardcodes
                # its 640; generalized so 256-trained study models map
                # their GT boxes into the right letterbox frame)
                frame = exp.test_size[0]
                r = min(frame / out_img.shape[0],
                        frame / out_img.shape[1])
                nw = int(out_img.shape[1] * r)
                nh = int(out_img.shape[0] * r)
                fm = np.zeros((1, 4))
                fm[0] = (
                    dis_label[0] / out_img.shape[1] * nw / frame,
                    dis_label[1] / out_img.shape[0] * nh / frame,
                    (dis_label[0] + dis_label[2]) / out_img.shape[1]
                    * nw / frame,
                    (dis_label[1] + dis_label[3]) / out_img.shape[0]
                    * nh / frame,
                )
                gt_boxes_fm.append(fm)
                bbox = [float(v) for v in dis_label]
            fname = (
                f"offset_{str(offset).zfill(3)}_{dis_type}.png"
            )
            cv2.imwrite(os.path.join(data_path, fname), out_img)
            entries.append((offset, out_img.shape[0], out_img.shape[1],
                            bbox))

        gt_path = build_gt_json(data_path, entries)
        names, bboxes, scores, classes = run_sweep(
            predictor, data_path, dis_type, gt_boxes_fm, vis_path,
            table_dic,
        )
        dt_dir = os.path.join(dt_folder, dis_type)
        os.makedirs(dt_dir, exist_ok=True)
        dt_json_path = dt_json_create(
            names, bboxes, scores, classes, dt_dir, id_trans
        )
        print(f"{'*' * 24}{dis_type}{'*' * 24}")
        coco_ap(gt_path, dt_json_path)

    sweep("none")
    for theta in range(t0, t1, tstep):
        sweep(f"theta_{theta}", theta=theta)

    # ---- final activation table (ref :613-620; sizes follow the model
    # input -- 80/40/20 at the reference's 640) ----
    fm_size = [exp.test_size[0] // 8, exp.test_size[0] // 16,
               exp.test_size[0] // 32]
    offsets = ["-100", "-50", "000", "050", "100"]
    for idx, size in enumerate(fm_size):
        print(f"\n===== Feature Map Size: {size}x{size} =====")
        rows = []
        key = lambda off, d: f"offset_{off}_{d}"
        rows.append(
            ["None"] + [
                table_dic.get(key(o, "none"), [float("nan")] * 3)[idx]
                for o in offsets
            ]
        )
        for theta in range(t0, t1, tstep):
            rows.append(
                [f"theta_{theta}"] + [
                    table_dic.get(
                        key(o, f"theta_{theta}"), [float("nan")] * 3
                    )[idx]
                    for o in offsets
                ]
            )
        print(tabulate(rows, headers=["", "-100", "-50", "0", "50", "100"],
                       tablefmt="grid", floatfmt=".4f"))


if __name__ == "__main__":
    from eop_tpu.utils.logger import catch

    catch(main)()
