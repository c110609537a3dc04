"""In-VM STARK verifier building blocks (stdlib stark/ modules).

The in-VM random coin must reproduce the host transcript challenger
(transcript/challenger.py DuplexChallenger) felt-for-felt — the base of
the recursive verifier (reference
crates/lib/core/asm/stark/random_coin.masm; VERDICT round-3 ask #4).
"""

import pytest

from miden_tpu.stdlib import assemble_with_stdlib, stdlib_event_handlers
from miden_tpu.transcript.challenger import DuplexChallenger
from miden_tpu.vm.processor import execute

SEED = [0x6D69_6465, 0x6E2D_7470, 0x752D_766D, 0x0000_0001]


def _run(src: str, inputs=None):
    prog = assemble_with_stdlib(src)
    return execute(prog, inputs or [], event_handlers=stdlib_event_handlers())


def _seed_push() -> str:
    # word [s0, s1, s2, s3] with s0 on top
    return f"push.{SEED[3]}.{SEED[2]}.{SEED[1]}.{SEED[0]}"


def test_init_and_first_samples_match_host():
    """Sampling straight after init: duplex over the zero-rate/seed-cap
    state; outputs pop from the end (state[7] first)."""
    src = f"""
    use miden::core::stark::random_coin
    begin
        {_seed_push()}
        exec.random_coin::init
        exec.random_coin::sample_felt
        exec.random_coin::sample_felt
        exec.random_coin::sample_felt
    end
    """
    out = _run(src)
    host = DuplexChallenger(SEED)
    want = [host.sample(), host.sample(), host.sample()]
    # samples pushed in order => third on top
    assert list(out.stack[0:3]) == [want[2], want[1], want[0]]


def test_observe_then_sample_matches_host_partial_buffer():
    """A 3-felt observation (partial buffer) flushes lazily on sample."""
    vals = [11, 22, 33]
    obs = " ".join(f"push.{v} exec.random_coin::observe_felt" for v in vals)
    src = f"""
    use miden::core::stark::random_coin
    begin
        {_seed_push()}
        exec.random_coin::init
        {obs}
        exec.random_coin::sample_felt
    end
    """
    out = _run(src)
    host = DuplexChallenger(SEED)
    host.observe_slice(vals)
    assert out.stack[0] == host.sample()


def test_observe_across_rate_boundary_matches_host():
    """11 observations cross the 8-lane rate boundary: one eager duplex
    at 8, the remaining 3 flushed lazily; untouched lanes persist."""
    vals = list(range(100, 111))
    obs = " ".join(f"push.{v} exec.random_coin::observe_felt" for v in vals)
    src = f"""
    use miden::core::stark::random_coin
    begin
        {_seed_push()}
        exec.random_coin::init
        {obs}
        exec.random_coin::sample_felt
        exec.random_coin::sample_felt
    end
    """
    out = _run(src)
    host = DuplexChallenger(SEED)
    host.observe_slice(vals)
    w = [host.sample(), host.sample()]
    assert list(out.stack[0:2]) == [w[1], w[0]]


def test_interleaved_observe_sample_matches_host():
    """observe / sample / observe / sample — the observe clears the
    output buffer exactly like the host."""
    src = f"""
    use miden::core::stark::random_coin
    begin
        {_seed_push()}
        exec.random_coin::init
        push.7 exec.random_coin::observe_felt
        exec.random_coin::sample_felt
        push.9 exec.random_coin::observe_felt
        exec.random_coin::sample_felt
    end
    """
    out = _run(src)
    host = DuplexChallenger(SEED)
    host.observe(7)
    s1 = host.sample()
    host.observe(9)
    s2 = host.sample()
    assert list(out.stack[0:2]) == [s2, s1]


def test_sample_ext_and_bits_match_host():
    src = f"""
    use miden::core::stark::random_coin
    begin
        {_seed_push()}
        exec.random_coin::init
        push.5 exec.random_coin::observe_felt
        exec.random_coin::sample_ext
        push.16 exec.random_coin::sample_bits
    end
    """
    out = _run(src)
    host = DuplexChallenger(SEED)
    host.observe(5)
    c0, c1 = host.sample_ext()
    bits = host.sample_bits(16)
    # stack: [bits, c0, c1] (sample_ext leaves [c0, c1], bits pushed on top)
    assert list(out.stack[0:3]) == [bits, c0, c1]


def test_check_witness_accepts_host_grind():
    host = DuplexChallenger(SEED)
    host.observe(42)
    w = host.grind(4)
    src = f"""
    use miden::core::stark::random_coin
    begin
        push.42
        push.4 push.{w}
        {_seed_push()}
        exec.random_coin::init
        movup.2
        exec.random_coin::observe_felt
        exec.random_coin::check_witness
    end
    """
    _run(src)  # must not trap


def test_check_witness_rejects_bad_witness():
    from miden_tpu.vm.processor import ExecutionError

    src = f"""
    use miden::core::stark::random_coin
    begin
        {_seed_push()}
        exec.random_coin::init
        push.12 push.1234567 exec.random_coin::check_witness
    end
    """
    with pytest.raises(ExecutionError):
        _run(src)


def test_observe_mem_matches_host():
    """observe_mem over a staged region == host observe_slice."""
    vals = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]
    stores = " ".join(
        f"push.{v} push.{1000 + i} mem_store" for i, v in enumerate(vals)
    )
    src = f"""
    use miden::core::stark::random_coin
    begin
        {_seed_push()}
        exec.random_coin::init
        {stores}
        push.{len(vals)} push.1000
        exec.random_coin::observe_mem
        exec.random_coin::sample_felt
    end
    """
    out = _run(src)
    host = DuplexChallenger(SEED)
    host.observe_slice(vals)
    assert out.stack[0] == host.sample()


def test_public_inputs_binding_matches_statement_observe():
    """observe_publics + observe_shape reproduce Statement.observe for a
    Miden-shaped statement header."""
    publics = [7, 0, 3, 9, 2, 5]
    log_heights = [14, 12, 10]
    stores = " ".join(
        f"push.{v} push.{2000 + i} mem_store" for i, v in enumerate(publics)
    )
    lh_stores = " ".join(
        f"push.{v} push.{3000 + i} mem_store"
        for i, v in enumerate(log_heights)
    )
    src = f"""
    use miden::core::stark::public_inputs
    use miden::core::stark::random_coin
    begin
        {_seed_push()}
        exec.random_coin::init
        {stores} {lh_stores}
        push.{len(publics)} push.2000
        exec.public_inputs::observe_publics
        push.3000 push.{len(log_heights)}
        exec.public_inputs::observe_shape
        exec.random_coin::sample_felt
    end
    """
    out = _run(src)
    host = DuplexChallenger(SEED)
    host.observe_slice(publics)
    # no aux inputs in this statement
    host.observe(len(log_heights))
    for lh in log_heights:
        host.observe(lh)
    assert out.stack[0] == host.sample()


@pytest.mark.slow
def test_random_coin_program_proves_e2e():
    """Execute + prove a program driving the in-VM coin (the sampled
    value pinned against the host challenger)."""
    from miden_tpu.stark.params import TEST_PARAMS
    from miden_tpu.stdlib import stdlib_assembler
    from miden_tpu.vm.prove import prove_program, verify_program

    host = DuplexChallenger(SEED)
    host.observe(77)
    want = host.sample()
    src = f"""
    use miden::core::stark::random_coin
    begin
        {_seed_push()}
        exec.random_coin::init
        push.77 exec.random_coin::observe_felt
        exec.random_coin::sample_felt
        push.{want} assert_eq
    end
    """
    prog = stdlib_assembler().assemble_program(src)
    out, proof = prove_program(
        prog, params=TEST_PARAMS, event_handlers=stdlib_event_handlers()
    )
    verify_program(proof, params=TEST_PARAMS, partial=True)
