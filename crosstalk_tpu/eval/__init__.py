from crosstalk_tpu.eval.engine import evaluate, evaluate_and_save
from crosstalk_tpu.eval.fast_forward import make_fast_forward
from crosstalk_tpu.eval.int8_forward import calibrate_int8, make_int8_forward

__all__ = [
    "evaluate",
    "evaluate_and_save",
    "make_fast_forward",
    "calibrate_int8",
    "make_int8_forward",
]
