from .base_exp import BaseExp
from .build import config_name, get_exp, get_exp_by_file, get_exp_by_name
from .yolox_base import Exp
from .yolox_24p_base import Exp24P
