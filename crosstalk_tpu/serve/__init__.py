"""Online serving: dynamic batching + HTTP server over the fast forward path.

The reference (djpbarry/Torch-Unet) is offline-only — its eval CLI
(test-cross-talk-model.py) scores a directory of tiles in one pass. This
subsystem adds the production-serving counterpart with a TPU-first design:
requests of any size are coalesced into ONE static batch shape so XLA
compiles exactly one program (no shape-polymorphic recompiles on the
serving path), padding rides along for free, and the device stays busy
under concurrent small requests.
"""

from crosstalk_tpu.serve.batcher import DynamicBatcher
from crosstalk_tpu.serve.predictor import make_predictor
from crosstalk_tpu.serve.server import CrosstalkServer

__all__ = ["DynamicBatcher", "make_predictor", "CrosstalkServer"]
