from crosstalk_tpu.eval.engine import evaluate, evaluate_and_save
from crosstalk_tpu.eval.fast_forward import make_fast_forward

__all__ = ["evaluate", "evaluate_and_save", "make_fast_forward"]
