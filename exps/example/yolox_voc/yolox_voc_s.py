"""VOC-wired yolox-s config (ref exps/example/yolox_voc/yolox_voc_s.py)."""

import os

from eop_tpu.exp import Exp as MyExp


class Exp(MyExp):
    def __init__(self):
        super().__init__()
        self.num_classes = 20
        self.depth = 0.33
        self.width = 0.50
        self.warmup_epochs = 1
        self.exp_name = os.path.split(os.path.realpath(__file__))[1].split(".")[0]

    def get_data_loader(self, batch_size, is_distributed, no_aug=False,
                        cache_img=False, rank=0, world_size=1, seed=None):
        from eop_tpu.data.augment import TrainTransform
        from eop_tpu.data.dataloading import (
            DataLoader,
            worker_init_reset_seed,
        )
        from eop_tpu.data.mosaic import MosaicDetection
        from eop_tpu.data.samplers import InfiniteSampler, YoloBatchSampler
        from eop_tpu.data.voc import VOCDetection

        dataset = VOCDetection(
            data_dir=os.path.join(self.data_dir or "datasets", "VOCdevkit"),
            image_sets=[("2007", "trainval"), ("2012", "trainval")],
            img_size=self.input_size,
            preproc=TrainTransform(
                max_labels=50, flip_prob=self.flip_prob,
                hsv_prob=self.hsv_prob,
            ),
            cache=cache_img,
        )
        dataset = MosaicDetection(
            dataset,
            mosaic=not no_aug,
            img_size=self.input_size,
            preproc=TrainTransform(
                max_labels=120, flip_prob=self.flip_prob,
                hsv_prob=self.hsv_prob,
            ),
            degrees=self.degrees,
            translate=self.translate,
            mosaic_scale=self.mosaic_scale,
            mixup_scale=self.mixup_scale,
            shear=self.shear,
            enable_mixup=self.enable_mixup,
            mosaic_prob=self.mosaic_prob,
            mixup_prob=self.mixup_prob,
            seed=seed,
        )
        self.dataset = dataset
        if is_distributed:
            batch_size = batch_size // world_size
        sampler = InfiniteSampler(len(dataset), seed=self.seed or 0,
                                  rank=rank, world_size=world_size)
        batch_sampler = YoloBatchSampler(
            sampler, batch_size, drop_last=False, mosaic=not no_aug,
        )
        return DataLoader(dataset, batch_sampler=batch_sampler,
                          num_workers=self.data_num_workers,
                          worker_init_fn=worker_init_reset_seed)

    def get_eval_loader(self, batch_size, is_distributed=False,
                        testdev=False, legacy=False):
        from eop_tpu.data.augment import ValTransform
        from eop_tpu.data.dataloading import DataLoader
        from eop_tpu.data.voc import VOCDetection

        valdataset = VOCDetection(
            data_dir=os.path.join(self.data_dir or "datasets", "VOCdevkit"),
            image_sets=[("2007", "test")],
            img_size=self.test_size,
            preproc=ValTransform(legacy=legacy),
        )
        sampler = None
        if is_distributed:
            # per-host slice like the base class; the evaluator merges the
            # per-host result dicts
            from eop_tpu.parallel import dist

            sampler = list(range(
                dist.get_rank(), len(valdataset), dist.get_world_size()
            ))
        return DataLoader(valdataset, batch_size=batch_size, shuffle=False,
                          sampler=sampler,
                          num_workers=self.data_num_workers)

    def get_evaluator(self, batch_size, is_distributed=False, testdev=False,
                      legacy=False):
        from eop_tpu.eval.voc_evaluator import VOCEvaluator

        return VOCEvaluator(
            dataloader=self.get_eval_loader(batch_size, is_distributed,
                                            testdev, legacy),
            img_size=self.test_size,
            confthre=self.test_conf,
            nmsthre=self.nmsthre,
            num_classes=self.num_classes,
        )
