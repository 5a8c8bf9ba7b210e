"""daccord_tpu — a TPU-native long-read consensus / error-correction framework.

A from-scratch rebuild of the capabilities of gt1/daccord (non-hybrid long read
consensus via local de Bruijn graph assembly; Tischler & Myers 2017) designed
TPU-first: dense batched tensor programs over a bounded k-mer universe in
JAX/XLA/Pallas, with host-side streaming loaders for the dazzler DB / daligner
.las on-disk formats. See SURVEY.md for the reference structural analysis and
ALGORITHM.md for the pinned algorithm specification.

Layout (SURVEY.md section 7):
  formats/   - .db/.idx/.bps + .las + FASTA readers AND synthetic writers
  sim/       - seeded read/pile simulator (fixture generator; no daligner in env)
  align/     - pinned NumPy edit-distance DP (the libmaus2::lcs::NP analog)
  oracle/    - pure-NumPy reference implementation = ground truth
  ops/       - JAX/Pallas device kernels (k-mer counting, DBG path DP, scoring)
  pipeline/  - host pipeline: pile -> padded window batches -> device -> stitch
  parallel/  - sharding planner (computeintervals analog), mesh/pjit runners
  tools/     - CLI tools with reference flag parity (daccord, computeintervals,
               lasfilteralignments, filterchains, lasdetectsimplerepeats,
               fillfasta)
  utils/     - config, logging, timing
"""

__version__ = "0.1.0"

from daccord_tpu.utils.config import DaccordConfig  # noqa: F401
