"""Abstract experiment config ("Exp") base.

Parity target: `BaseExp` (`/root/reference/yolox/exp/base_exp.py:17-75`) —
the experiment object is both configuration and factory (model, data,
optimizer, scheduler, evaluator), printable as a table, with CLI override
via ``merge(["key", "value", ...])`` and type coercion.
"""

from __future__ import annotations

import ast
import pprint
from abc import ABCMeta, abstractmethod

from tabulate import tabulate


class BaseExp(metaclass=ABCMeta):
    """Basic class for any experiment."""

    def __init__(self):
        self.seed = None
        self.output_dir = "./eop_outputs"
        self.print_interval = 100
        self.eval_interval = 10

    @abstractmethod
    def get_model(self):
        pass

    @abstractmethod
    def get_data_loader(self, batch_size: int, is_distributed: bool):
        pass

    @abstractmethod
    def get_optimizer(self, batch_size: int, iters_per_epoch: int):
        pass

    @abstractmethod
    def get_lr_scheduler(self, lr: float, iters_per_epoch: int, **kwargs):
        pass

    def get_evaluator(self, batch_size: int, is_distributed: bool):
        raise NotImplementedError

    def eval(self, model_variables, evaluator):
        raise NotImplementedError

    def __repr__(self):
        table_header = ["keys", "values"]
        exp_table = [
            (str(k), pprint.pformat(v))
            for k, v in vars(self).items()
            if not k.startswith("_")
        ]
        return tabulate(exp_table, headers=table_header,
                        tablefmt="fancy_grid")

    def merge(self, cfg_list):
        """CLI override: alternating key/value strings (ref `merge:63-75`)."""
        assert len(cfg_list) % 2 == 0
        for k, v in zip(cfg_list[0::2], cfg_list[1::2]):
            if hasattr(self, k):
                src_value = getattr(self, k)
                src_type = type(src_value)
                if src_value is None and isinstance(v, str):
                    # None-default attrs (seed, data_dir, random_size...):
                    # parse literals, keep plain strings as strings
                    try:
                        v = ast.literal_eval(v)
                    except (ValueError, SyntaxError):
                        pass
                elif src_value is not None and src_type != type(v):
                    if src_type in (tuple, list, dict, bool):
                        # container/bool targets: parse the literal, then
                        # cast (naive tuple("(1,2)") would char-split)
                        v = src_type(ast.literal_eval(v))
                    else:
                        try:
                            v = src_type(v)
                        except Exception:
                            v = ast.literal_eval(v)
                setattr(self, k, v)
