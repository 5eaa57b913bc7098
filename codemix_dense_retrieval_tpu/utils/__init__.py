from codemix_dense_retrieval_tpu.utils.logging import get_logger, setup_logging
from codemix_dense_retrieval_tpu.utils.timing import Timer, phase_timer
from codemix_dense_retrieval_tpu.utils.seeding import seed_everything

__all__ = ["get_logger", "setup_logging", "Timer", "phase_timer", "seed_everything"]
