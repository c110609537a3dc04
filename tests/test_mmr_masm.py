"""stdlib collections::mmr — in-VM MMR vs the host twin (merkle/mmr.py).

Reference contract: crates/lib/core/asm/collections/mmr.masm (get /
pack / unpack / add); commitments are the padded-rule Poseidon2 sponge
over [num_leaves, 0, 0, 0] || padded peaks (MmrPeaks.hash_peaks).
"""

import pytest

from miden_tpu.merkle import Mmr
from miden_tpu.stdlib import assemble_with_stdlib, stdlib_event_handlers
from miden_tpu.vm.processor import AdviceProvider, execute

MMR_PTR = 10000


def _run(src: str, advice=None, inputs=None):
    prog = assemble_with_stdlib(src)
    return execute(
        prog,
        inputs or [],
        advice=advice,
        event_handlers=stdlib_event_handlers(),
    )


def _host_mmr(n_leaves: int) -> Mmr:
    return Mmr([[i + 1, 2 * i, 3, i] for i in range(n_leaves)])


def _packed_preimage(mmr: Mmr) -> list[int]:
    peaks = mmr.peaks()
    num = len(peaks.peaks)
    padded = 16 if num < 16 else num + (num & 1)
    flat = [mmr.forest, 0, 0, 0]
    for p in peaks.peaks:
        flat.extend(p)
    flat.extend([0] * ((padded - num) * 4))
    return flat


def _advice_for(mmr: Mmr) -> AdviceProvider:
    adv = AdviceProvider()
    com = mmr.peaks().hash_peaks()
    adv.map[tuple(com)] = _packed_preimage(mmr)
    adv.store.extend(mmr.inner_nodes())
    return adv


@pytest.mark.parametrize("n_leaves", [1, 3, 7, 11])
def test_unpack_then_get_matches_host(n_leaves):
    mmr = _host_mmr(n_leaves)
    com = mmr.peaks().hash_peaks()
    pos = n_leaves - 1
    want = mmr.get(pos)
    src = f"""
    use miden::core::collections::mmr
    begin
        push.{MMR_PTR}
        push.{com[3]}.{com[2]}.{com[1]}.{com[0]}
        exec.mmr::unpack
        push.{MMR_PTR} push.{pos}
        exec.mmr::get
    end
    """
    out = _run(src, advice=_advice_for(mmr))
    assert list(out.stack[0:4]) == list(want)


def test_get_every_position():
    mmr = _host_mmr(7)
    com = mmr.peaks().hash_peaks()
    for pos in range(7):
        src = f"""
        use miden::core::collections::mmr
        begin
            push.{MMR_PTR}
            push.{com[3]}.{com[2]}.{com[1]}.{com[0]}
            exec.mmr::unpack
            push.{MMR_PTR} push.{pos}
            exec.mmr::get
        end
        """
        out = _run(src, advice=_advice_for(mmr))
        assert list(out.stack[0:4]) == list(mmr.get(pos)), pos


def test_get_out_of_range_fails():
    from miden_tpu.vm.processor import ExecutionError

    mmr = _host_mmr(3)
    com = mmr.peaks().hash_peaks()
    src = f"""
    use miden::core::collections::mmr
    begin
        push.{MMR_PTR}
        push.{com[3]}.{com[2]}.{com[1]}.{com[0]}
        exec.mmr::unpack
        push.{MMR_PTR} push.3
        exec.mmr::get
    end
    """
    with pytest.raises(ExecutionError):
        _run(src, advice=_advice_for(mmr))


@pytest.mark.parametrize("n_leaves", [1, 2, 3, 6])
def test_unpack_pack_roundtrip(n_leaves):
    """unpack then pack returns the same commitment."""
    mmr = _host_mmr(n_leaves)
    com = mmr.peaks().hash_peaks()
    src = f"""
    use miden::core::collections::mmr
    begin
        push.{MMR_PTR}
        push.{com[3]}.{com[2]}.{com[1]}.{com[0]}
        exec.mmr::unpack
        push.{MMR_PTR}
        exec.mmr::pack
    end
    """
    out = _run(src, advice=_advice_for(mmr))
    assert list(out.stack[0:4]) == list(com)


@pytest.mark.parametrize("n_leaves", [1, 2, 3, 7])
def test_add_matches_host(n_leaves):
    """In-VM add then pack == host add then hash_peaks."""
    mmr = _host_mmr(n_leaves)
    com = mmr.peaks().hash_peaks()
    adv = _advice_for(mmr)
    new_leaf = [111, 222, 333, 444]
    host2 = _host_mmr(n_leaves)
    host2.add(new_leaf)
    want = host2.peaks().hash_peaks()
    src = f"""
    use miden::core::collections::mmr
    begin
        push.{MMR_PTR}
        push.{com[3]}.{com[2]}.{com[1]}.{com[0]}
        exec.mmr::unpack
        push.{MMR_PTR}
        push.{new_leaf[3]}.{new_leaf[2]}.{new_leaf[1]}.{new_leaf[0]}
        exec.mmr::add
        push.{MMR_PTR}
        exec.mmr::pack
    end
    """
    out = _run(src, advice=adv)
    assert list(out.stack[0:4]) == list(want)


def test_unpack_rejects_wrong_commitment():
    from miden_tpu.vm.processor import ExecutionError

    mmr = _host_mmr(3)
    com = list(mmr.peaks().hash_peaks())
    adv = _advice_for(mmr)
    adv.map[tuple([com[0] ^ 1, *com[1:]])] = _packed_preimage(mmr)
    bad = [com[0] ^ 1, *com[1:]]
    src = f"""
    use miden::core::collections::mmr
    begin
        push.{MMR_PTR}
        push.{bad[3]}.{bad[2]}.{bad[1]}.{bad[0]}
        exec.mmr::unpack
    end
    """
    with pytest.raises(ExecutionError):
        _run(src, advice=adv)
