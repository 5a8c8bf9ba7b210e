from daccord_tpu.align.editdp import (  # noqa: F401
    edit_distance, edit_table, traceback_bpos, batch_edit_distance,
    batch_realign, PAD,
)
