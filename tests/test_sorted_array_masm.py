"""stdlib collections::sorted_array — binary-search lookups.

Ground truth: a Python bisect over the same order (non-decreasing
lexicographic, element 0 most significant). Reference module contract:
crates/lib/core/asm/collections/sorted_array.masm (ours swaps the
advice-hint mechanism for a proof-side binary search).
"""

import random

import pytest

from miden_tpu.stdlib import assemble_with_stdlib, stdlib_event_handlers
from miden_tpu.vm.processor import ExecutionError, execute

BASE = 4000


def _run(src: str):
    return execute(
        assemble_with_stdlib(src), [], event_handlers=stdlib_event_handlers()
    )


def _stores(words, base=BASE, stride=4):
    out = []
    for i, w in enumerate(words):
        for j, v in enumerate(w):
            out.append(f"push.{v} push.{base + stride * i + j} mem_store")
    return " ".join(out)


def _find_word_src(words, value):
    end = BASE + 4 * len(words)
    return f"""
    use miden::core::collections::sorted_array
    begin
        {_stores(words)}
        push.{end} push.{BASE}
        push.{value[3]}.{value[2]}.{value[1]}.{value[0]}
        exec.sorted_array::find_word
    end
    """


def _lower_bound(words, value):
    lo = 0
    for w in words:
        if tuple(w) < tuple(value):
            lo += 1
        else:
            break
    return lo


def test_find_word_hits_and_misses():
    rng = random.Random(9)
    keys = sorted(
        {tuple(rng.randrange(50) for _ in range(4)) for _ in range(12)}
    )
    words = [list(k) for k in keys]
    probes = list(keys[:3]) + [keys[-1]] + [
        tuple(rng.randrange(50) for _ in range(4)) for _ in range(6)
    ]
    for value in probes:
        out = _run(_find_word_src(words, list(value)))
        lo = _lower_bound(words, value)
        want_found = 1 if (lo < len(words) and keys[lo] == value) else 0
        assert out.stack[0] == want_found, (value, lo)
        assert out.stack[1] == BASE + 4 * lo
        assert out.stack[2] == BASE
        assert out.stack[3] == BASE + 4 * len(words)


def test_find_word_empty_range():
    out = _run(_find_word_src([], [1, 2, 3, 4]))
    assert list(out.stack[0:4]) == [0, BASE, BASE, BASE]


def test_assert_sorted_words_accepts_and_rejects():
    words = [[1, 0, 0, 0], [1, 2, 0, 0], [1, 2, 0, 5], [9, 0, 0, 0]]
    end = BASE + 4 * len(words)
    src = f"""
    use miden::core::collections::sorted_array
    begin
        {_stores(words)}
        push.{end} push.{BASE}
        exec.sorted_array::assert_sorted_words
        drop drop push.1
    end
    """
    assert _run(src).stack[0] == 1

    bad = [words[0], words[3], words[1], words[2]]
    src = f"""
    use miden::core::collections::sorted_array
    begin
        {_stores(bad)}
        push.{end} push.{BASE}
        exec.sorted_array::assert_sorted_words
        drop drop push.1
    end
    """
    with pytest.raises(ExecutionError):
        _run(src)


def test_find_key_value_pairs():
    rng = random.Random(4)
    keys = sorted(
        {tuple(rng.randrange(30) for _ in range(4)) for _ in range(8)}
    )
    pairs = [
        (list(k), [rng.randrange(100) for _ in range(4)]) for k in keys
    ]
    words = [w for kv in pairs for w in kv]
    end = BASE + 8 * len(pairs)
    for value in list(keys[:2]) + [
        tuple(rng.randrange(30) for _ in range(4)) for _ in range(4)
    ]:
        src = f"""
        use miden::core::collections::sorted_array
        begin
            {_stores(words)}
            push.{end} push.{BASE}
            push.{value[3]}.{value[2]}.{value[1]}.{value[0]}
            exec.sorted_array::find_key_value
            # load the value word of the found pair for checking
            dup.1 add.4 mem_load
        end
        """
        out = _run(src)
        lo = 0
        for k in keys:
            if tuple(k) < tuple(value):
                lo += 1
            else:
                break
        want_found = 1 if (lo < len(keys) and keys[lo] == value) else 0
        # stack: [v_elem0, is_found, kv_ptr, start, end]
        assert out.stack[1] == want_found
        assert out.stack[2] == BASE + 8 * lo
        if want_found:
            assert out.stack[0] == pairs[lo][1][0]


def test_assert_sorted_keys_rejects_swapped():
    pairs = [([5, 0, 0, 0], [1, 1, 1, 1]), ([2, 0, 0, 0], [2, 2, 2, 2])]
    words = [w for kv in pairs for w in kv]
    end = BASE + 8 * len(pairs)
    src = f"""
    use miden::core::collections::sorted_array
    begin
        {_stores(words)}
        push.{end} push.{BASE}
        exec.sorted_array::assert_sorted_keys
        drop drop push.1
    end
    """
    with pytest.raises(ExecutionError):
        _run(src)


def test_range_validation():
    src = f"""
    use miden::core::collections::sorted_array
    begin
        push.{BASE} push.{BASE + 4}
        exec.sorted_array::assert_sorted_words
        drop drop push.1
    end
    """
    with pytest.raises(ExecutionError):
        _run(src)
    src = f"""
    use miden::core::collections::sorted_array
    begin
        push.{BASE + 2} push.{BASE + 1}
        exec.sorted_array::assert_sorted_words
        drop drop push.1
    end
    """
    with pytest.raises(ExecutionError):
        _run(src)
