"""Interpreter pause/resume (vm/resume.py), the analog of the
reference's FastProcessor stepping (processor/src/fast/step.rs
BreakReason / ResumeContext)."""

import pytest

from miden_tpu.vm.assembler import assemble
from miden_tpu.vm.processor import ExecutionError, execute
from miden_tpu.vm.resume import BreakReason, execute_stepwise

LOOP_SRC = """
begin
    push.200 push.0
    dup.1 neq.0
    while.true
        add.1
        swap sub.1 swap
        dup.1 neq.0
    end
    swap drop
end
"""


def test_stepwise_matches_uninterrupted_execution():
    prog = assemble(LOOP_SRC)
    want = execute(prog, []).stack

    ctx = execute_stepwise(prog, [], cycles=64)
    pauses = 0
    clks = []
    while not ctx.done:
        assert ctx.reason == BreakReason.CYCLE_BUDGET
        clks.append(ctx.clk)
        # the paused processor is genuinely mid-execution and inspectable
        assert ctx.processor.clk >= 64 * (pauses + 1) - 1
        pauses += 1
        ctx.resume(64)
    assert ctx.reason == BreakReason.FINISHED
    assert pauses > 3
    assert clks == sorted(clks)
    assert list(ctx.output.stack) == list(want)


def test_stepwise_finish_and_single_shot():
    prog = assemble(LOOP_SRC)
    ctx = execute_stepwise(prog, [], cycles=32)
    assert ctx.reason == BreakReason.CYCLE_BUDGET
    out = ctx.finish()
    assert list(out.stack) == list(execute(prog, []).stack)
    # a large first budget finishes in one shot
    ctx2 = execute_stepwise(prog, [], cycles=1 << 20)
    assert ctx2.reason == BreakReason.FINISHED


def test_stepwise_cancel():
    prog = assemble(LOOP_SRC)
    ctx = execute_stepwise(prog, [], cycles=16)
    assert not ctx.done
    ctx.cancel()
    assert ctx.reason == BreakReason.CANCELLED
    with pytest.raises(ExecutionError):
        ctx.finish()


def test_stepwise_surfaces_execution_errors():
    prog = assemble("begin push.1 push.0 u32div end")  # division by zero
    ctx = execute_stepwise(prog, [], cycles=1 << 16)
    assert ctx.reason == BreakReason.ERROR
    with pytest.raises(ExecutionError):
        ctx.finish()
