"""Active-learning layer: pool scoring dispatch + the cycle orchestrator.

The reference's L5/L6 (SURVEY.md): tools/train_RetinaNet.py's cycle loop,
mmdet/apis/test.py's uncertainty dispatch, and active_datasets' split
bookkeeping — as a thin host-side loop around the jitted engine steps.
"""

from .uncertainty import score_pool
from .loop import ALDriver, ALPaths
