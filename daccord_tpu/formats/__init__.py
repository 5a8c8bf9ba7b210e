from daccord_tpu.formats.dazzler_db import DazzlerDB, write_db  # noqa: F401
from daccord_tpu.formats.las import LasFile, Overlap, write_las  # noqa: F401
from daccord_tpu.formats.fasta import read_fasta, write_fasta  # noqa: F401
