from daccord_tpu.oracle.offset_likely import offset_likely_q16  # noqa: F401
from daccord_tpu.oracle.eprof import ErrorProfile  # noqa: F401
from daccord_tpu.oracle.dbg import window_consensus  # noqa: F401
from daccord_tpu.oracle.consensus import correct_read, run_oracle  # noqa: F401
