"""Device (vectorized) VM aux builder ≡ numeric (exact-int) builder.

The fused prover builds the VM LogUp aux columns on device
(aux_numeric.build_device_aux); this pins bit-equivalence against the
per-row exact-integer builder on real execution traces for all three VM
AIRs, including the accumulator column, every fraction column, and the
committed final values.
"""

import numpy as np

from miden_tpu.field import gl
from miden_tpu.field.goldilocks import Fp2, fp2_from_pairs_u64, fp2_to_pairs_u64, fp_to_u64
from miden_tpu.vm.assembler import assemble
from miden_tpu.vm.trace import execute_and_trace
from miden_tpu.vm.constraints.core import CoreVmAir
from miden_tpu.vm.constraints.chiplets_air import ChipletsVmAir
from miden_tpu.vm.constraints.poseidon2_air import Poseidon2PermutationAir

RAND = [(0x1234_5678_9ABC_DEF0, 0x0FED_CBA9_8765_4321), (12345, 67890)]


def _dev_randomness():
    return [
        fp2_from_pairs_u64(np.asarray(r, dtype=np.uint64)) for r in RAND
    ]


def test_device_aux_matches_numeric_on_real_trace():
    prog = assemble(
        "begin push.2 push.3 u32wrapping_add push.5 mul "
        "push.1 if.true push.7 add else push.8 add end swap drop end"
    )
    _, trace = execute_and_trace(prog)
    publics = (
        list(trace.stack_inputs) + list(trace.stack_outputs)
        + list(trace.program_hash) + [0, 0, 0, 0]
    )
    for air, main in (
        (CoreVmAir(), trace.matrix),
        (ChipletsVmAir(), trace.chiplets),
        (Poseidon2PermutationAir(), trace.poseidon),
    ):
        main = np.asarray(main, dtype=np.uint64)
        aux_num, vals_num = air.build_aux_trace(main, publics, [], RAND)
        aux_dev, vals_dev = air.build_aux_trace(
            main, publics, [], _dev_randomness()
        )
        n, w_aux, _ = aux_num.shape
        dev_u64 = fp_to_u64(aux_dev).reshape(n, w_aux, 2)
        mism = np.argwhere(dev_u64 != aux_num)
        assert mism.size == 0, (
            f"{type(air).__name__}: aux differs first at {mism[:5]}"
        )
        if isinstance(vals_dev, Fp2) and vals_dev.shape[0]:
            pairs = fp2_to_pairs_u64(vals_dev)
            got = [(int(p[0]), int(p[1])) for p in pairs]
        else:
            got = []
        assert got == [tuple(int(x) for x in v) for v in vals_num], (
            type(air).__name__
        )
