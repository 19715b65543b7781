"""Hardware-PRNG stream-quality probe for the fused synthesize seeding.

The kernel seeds the Mosaic PRNG per (block, stream) with
(seed0, seed1 ^ stream*WEYL).  If the hardware generator is sensitive to
correlated seeds, nearby blocks/streams could emit correlated bits, which
would silently degrade training data.  This probe draws raw words from the
exact seeding scheme and measures:
  * low-bit mean and within-row serial correlation,
  * bit agreement between every pair of (block, stream) sequences
    (expect 0.5 +- MC),
  * full-word collision rate across streams.

Usage: python scripts/prng_quality_check.py  (chip must be free)
"""
import os
import sys
import itertools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dl_ofdm_tpu.ops.fused_synth import _stream_seed

N = 16384
ROWS = 32
N_STREAMS = 8


def kernel(seed_ref, out_ref):
    sid = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0], _stream_seed(seed_ref, sid))
    out_ref[0] = pltpu.bitcast(pltpu.prng_random_bits((ROWS, N)), jnp.int32)


def main():
    seeds = jnp.asarray([12345, -987654321], jnp.int32)
    out = pl.pallas_call(
        kernel,
        grid=(N_STREAMS,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, ROWS, N), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_STREAMS, ROWS, N), jnp.int32),
    )(seeds)
    w = np.asarray(out).astype(np.uint32).reshape(N_STREAMS, -1)  # [S, 8N]

    lb = (w & 1).astype(np.float64)
    print(f"low-bit mean per stream: {lb.mean(axis=1).round(4)}")
    ser = [np.corrcoef(lb[s, :-1], lb[s, 1:])[0, 1] for s in range(N_STREAMS)]
    sig = 1.0 / np.sqrt(lb.shape[1])
    print(f"serial corr (low bit): max|r| = {np.abs(ser).max():.4f} "
          f"= {np.abs(ser).max()/sig:.1f} sigma (n={lb.shape[1]})")
    worst = 0.0
    for a, b in itertools.combinations(range(N_STREAMS), 2):
        agree = float((w[a] == w[b]).mean())
        eq_bits = float(((w[a] ^ w[b]) == 0).mean())
        bit_agree = float(
            (np.unpackbits(w[a].view(np.uint8)) ==
             np.unpackbits(w[b].view(np.uint8))).mean())
        worst = max(worst, abs(bit_agree - 0.5))
        if agree > 1e-3:
            print(f"streams {a},{b}: WORD COLLISIONS {agree:.4f}")
    print(f"cross-stream bit agreement: max|p-0.5| = {worst:.4f} "
          f"(MC sigma ~ {0.5/np.sqrt(w.shape[1]*32):.5f})")
    mc = 3 * 0.5 / np.sqrt(w.shape[1] * 32)
    assert worst < max(0.002, mc * 3), "cross-stream correlation detected"
    assert np.abs(ser).max() < 4.5 * sig, "serial correlation detected"
    assert abs(lb.mean() - 0.5) < 0.005
    print("PRNG quality OK")


if __name__ == "__main__":
    main()
