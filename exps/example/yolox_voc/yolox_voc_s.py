"""VOC-wired yolox-s config (ref exps/example/yolox_voc/yolox_voc_s.py)."""

import os

from eop_tpu.exp import Exp as _Scale, config_name


class Exp(_Scale):
    def __init__(self):
        super().__init__()
        self.depth, self.width = 0.33, 0.50
        self.num_classes = 20
        self.warmup_epochs = 1
        self.exp_name = config_name(__file__)

    def _devkit_dir(self):
        return os.path.join(self.data_dir or "datasets", "VOCdevkit")

    def get_data_loader(self, batch_size, is_distributed, no_aug=False,
                        cache_img=False, rank=0, world_size=1, seed=None):
        from eop_tpu.data.voc import VOCDetection

        dataset = VOCDetection(
            data_dir=self._devkit_dir(),
            image_sets=[("2007", "trainval"), ("2012", "trainval")],
            img_size=self.input_size,
            preproc=self.build_train_transform(max_labels=50),
            cache=cache_img,
        )
        # Mosaic wrap + sampling + workers are shared with the base exp
        return self.wrap_train_dataset(
            dataset, batch_size, is_distributed=is_distributed,
            no_aug=no_aug, rank=rank, world_size=world_size, seed=seed,
        )

    def get_eval_loader(self, batch_size, is_distributed=False,
                        testdev=False, legacy=False):
        from eop_tpu.data.augment import ValTransform
        from eop_tpu.data.dataloading import DataLoader
        from eop_tpu.data.voc import VOCDetection

        valdataset = VOCDetection(
            data_dir=self._devkit_dir(),
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
