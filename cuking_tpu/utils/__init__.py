from cuking_tpu.utils.status import (  # noqa: F401
    CukingError,
    FailedPreconditionError,
    InvalidArgumentError,
    ResourceExhaustedError,
)
from cuking_tpu.utils.stopwatch import StopWatch  # noqa: F401
