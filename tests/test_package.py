"""MAST packages (.masp, vm/package.py) — the analog of the reference's
miden-mast-package (crates/mast-package): named/versioned artifacts
wrapping a MAST forest with an export manifest and a digest over the
export roots."""

import pytest

from miden_tpu.vm.mast_io import MastFormatError
from miden_tpu.vm.package import (
    MastPackage,
    assemble_library_package,
    assemble_program_package,
)
from miden_tpu.vm.processor import execute

LIB = {
    "math::double": """
pub proc double
    add.0 mul.2
end

proc helper
    add.1
end

pub proc double_plus_one
    exec.helper mul.2
end
""",
}


def test_program_package_roundtrip(tmp_path):
    pkg = assemble_program_package(
        "fib-demo", "begin push.1 push.2 add end", version="1.2.3"
    )
    assert pkg.kind == "program"
    assert pkg.exports[0][0] == "main"
    path = tmp_path / "demo.masp"
    pkg.save(path)
    back = MastPackage.load(path)
    assert back.name == "fib-demo" and back.version == "1.2.3"
    assert back.digest == pkg.digest
    out = execute(back.program(), [])
    assert int(out.stack[0]) == 3


def test_library_package_exports_and_digest(tmp_path):
    pkg = assemble_library_package("mathlib", LIB)
    names = [n for n, _ in pkg.exports]
    assert names == ["math::double::double", "math::double::double_plus_one"]
    # private procs are not exported
    assert not any("helper" in n for n in names)
    back = MastPackage.from_bytes(pkg.to_bytes())
    assert back.exports == pkg.exports
    assert back.digest == pkg.digest
    # digest is order-insensitive in names (sorted by digest value)
    flipped = MastPackage(
        name=pkg.name,
        version=pkg.version,
        kind="library",
        forest=pkg.forest,
        exports=tuple(reversed(pkg.exports)),
    )
    assert flipped.digest == pkg.digest


def test_package_rejects_tampered_manifest():
    pkg = assemble_library_package("mathlib", LIB)
    data = bytearray(pkg.to_bytes())
    # flip a byte inside an export digest: no longer a forest root
    idx = data.index(b"double_plus_one") + len(b"double_plus_one")
    data[idx + 4] ^= 1
    with pytest.raises(MastFormatError):
        MastPackage.from_bytes(bytes(data))


def test_package_rejects_budget_and_garbage():
    with pytest.raises(MastFormatError):
        MastPackage.from_bytes(b"MASQ" + b"\x00" * 32)
    with pytest.raises(MastFormatError):
        MastPackage.from_bytes(b"MASP" + b"\x00" * (65 * 1024 * 1024))
    pkg = assemble_program_package("p", "begin push.1 drop end")
    data = pkg.to_bytes()
    with pytest.raises(MastFormatError):
        MastPackage.from_bytes(data[:-3])  # truncated forest
