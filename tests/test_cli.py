"""CLI integration tests mirroring the reference's suite
(reference: cli/tests/integration/main.rs): real files, real subprocess-free
invocation through ``main(argv)``, frame-size sweeps, path derivation,
overwrite protection, frame-range reassembly, offset windows, and list."""

import io
import os
import sys

import pytest

from zeekstd_tpu.cli import main, parse_byte_value
from zeekstd_tpu.seek_table import Format, SeekTable

from .test_decompress import structured_data

DATA = structured_data(50_000)


def run_cli(argv, stdin_data=None, capsys=None):
    return main(argv)


@pytest.fixture()
def workdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    (tmp_path / "input.txt").write_bytes(DATA)
    return tmp_path


def test_parse_byte_value():
    # (reference: cli/src/args.rs:20-42)
    assert parse_byte_value("10") == 10
    assert parse_byte_value("3K") == 3 * 1024
    assert parse_byte_value("2M") == 2 << 20
    assert parse_byte_value("1G") == 1 << 30
    assert parse_byte_value("5KiB") == 5 * 1024
    assert parse_byte_value("7B") == 7
    with pytest.raises(Exception):
        parse_byte_value("x12")


# Frame-size sweep like the reference's FRAME_SIZES (main.rs:10).
@pytest.mark.parametrize("frame_size", ["10", "123", "3K", "2M"])
def test_compress_decompress_cycle(workdir, frame_size):
    assert main(["-q", "compress", "-s", frame_size, "input.txt"]) == 0
    assert os.path.exists("input.txt.zst")
    assert main(["-q", "decompress", "-f", "-o", "out.bin", "input.txt.zst"]) == 0
    assert open("out.bin", "rb").read() == DATA


def test_default_command_is_compress(workdir):
    # (reference: cli/src/main.rs:29-31)
    assert main(["-q", "input.txt"]) == 0
    assert os.path.exists("input.txt.zst")


def test_output_name_derivation_failure(workdir):
    (workdir / "noext.bin").write_bytes(DATA)
    assert main(["-q", "compress", "noext.bin"]) == 0
    # decompress of a non-.zst name without -o fails
    # (reference: cli/src/command.rs:110-125, main.rs:182-280).
    os.rename("noext.bin.zst", "archive.data")
    assert main(["-q", "decompress", "archive.data"]) == 1


def test_overwrite_protection(workdir):
    assert main(["-q", "compress", "input.txt"]) == 0
    # Second run without --force must refuse (quiet => no prompt).
    assert main(["-q", "compress", "input.txt"]) == 1
    # --force allows it.
    assert main(["-q", "compress", "-f", "input.txt"]) == 0


def test_no_output_file_on_missing_input(workdir):
    # (reference: cli/tests/integration/main.rs:390-403)
    assert main(["-q", "compress", "missing.txt"]) == 1
    assert not os.path.exists("missing.txt.zst")


def test_separate_seek_table_file(workdir):
    # (reference: cli/tests/integration/main.rs:110-144)
    assert (
        main(["-q", "compress", "-s", "4K", "--seek-table-file", "table.zst", "input.txt"]) == 0
    )
    st = SeekTable.from_seekable_format(open("table.zst", "rb"), Format.HEAD)
    assert st.num_frames == -(-len(DATA) // 4096)
    # Archive itself has no appended table: raw frames only.
    assert (
        main([
            "-q", "decompress", "-f", "-o", "out.bin",
            "--seek-table-file", "table.zst", "input.txt.zst",
        ]) == 0
    )
    assert open("out.bin", "rb").read() == DATA


def test_frame_range_reassembly(workdir):
    # (reference: cli/tests/integration/main.rs:406-443)
    assert main(["-q", "compress", "-s", "8K", "input.txt"]) == 0
    st = SeekTable.from_seekable(open("input.txt.zst", "rb").read())
    parts = []
    for i in range(st.num_frames):
        assert (
            main([
                "-q", "decompress", "-f", "-o", f"part{i}", "--from-frame", str(i),
                "--to-frame", str(i), "input.txt.zst",
            ]) == 0
        )
        parts.append(open(f"part{i}", "rb").read())
    assert b"".join(parts) == DATA


def test_out_of_range_frame_errors(workdir):
    # (reference: cli/tests/integration/main.rs:488-511)
    assert main(["-q", "compress", "-s", "8K", "input.txt"]) == 0
    assert (
        main(["-q", "decompress", "-f", "-o", "x", "--from-frame", "999", "input.txt.zst"]) == 1
    )


def test_offset_window(workdir):
    # (reference: cli/tests/integration/main.rs:514-540)
    assert main(["-q", "compress", "-s", "8K", "input.txt"]) == 0
    assert (
        main([
            "-q", "decompress", "-f", "-o", "win.bin",
            "--from", "5000", "--to", "9000", "input.txt.zst",
        ]) == 0
    )
    assert open("win.bin", "rb").read() == DATA[5000:9000]
    # --to end
    assert (
        main([
            "-q", "decompress", "-f", "-o", "tail.bin",
            "--from", "40000", "--to", "end", "input.txt.zst",
        ]) == 0
    )
    assert open("tail.bin", "rb").read() == DATA[40000:]


def test_list_output(workdir, capsys):
    # (reference: cli/tests/integration/main.rs:543-573)
    assert main(["-q", "compress", "-s", "4K", "input.txt"]) == 0
    assert main(["list", "input.txt.zst"]) == 0
    out = capsys.readouterr().out
    assert len(out.strip().splitlines()) == 2  # header + summary
    assert main(["list", "--detail", "input.txt.zst"]) == 0
    out = capsys.readouterr().out
    st = SeekTable.from_seekable(open("input.txt.zst", "rb").read())
    assert len(out.strip().splitlines()) == st.num_frames + 1


def test_list_standalone_head_table(workdir, capsys):
    # (reference: cli/tests/integration/main.rs:576-601)
    assert (
        main(["-q", "compress", "-s", "4K", "--seek-table-file", "table.zst", "input.txt"]) == 0
    )
    assert main(["list", "--seek-table-format", "head", "table.zst"]) == 0
    out = capsys.readouterr().out
    assert "Frames" in out


def test_list_frame_subsets(workdir, capsys):
    assert main(["-q", "compress", "-s", "4K", "input.txt"]) == 0
    assert main(["list", "--detail", "--from-frame", "2", "--num-frames", "3", "input.txt.zst"]) == 0
    out = capsys.readouterr().out
    assert len(out.strip().splitlines()) == 4


def test_patch_create_and_apply(workdir):
    from .test_decompress import random_data

    old = random_data(50_000, seed=21)  # incompressible: prefix is the only help
    new = old[:20_000] + b"EDITEDEDITED" + old[20_000:]
    (workdir / "old.bin").write_bytes(old)
    (workdir / "new.bin").write_bytes(new)
    assert (
        main(["-q", "compress", "--patch-from", "old.bin", "-o", "patch.zst", "new.bin"]) == 0
    )
    assert (
        main([
            "-q", "decompress", "-f", "--patch-apply", "old.bin",
            "-o", "restored.bin", "patch.zst",
        ]) == 0
    )
    assert open("restored.bin", "rb").read() == new
    # Patch is much smaller than a fresh archive.
    assert main(["-q", "compress", "-f", "new.bin"]) == 0
    assert os.path.getsize("patch.zst") < os.path.getsize("new.bin.zst") // 3


def test_checksum_default_on(workdir):
    # CLI default: checksums on (reference: cli/src/compress.rs:41).
    assert main(["-q", "compress", "input.txt"]) == 0
    blob = open("input.txt.zst", "rb").read()
    assert blob[4] & 0x04
    assert main(["-q", "compress", "-f", "--no-checksum", "input.txt"]) == 0
    blob = open("input.txt.zst", "rb").read()
    assert not blob[4] & 0x04


def test_quiet_and_summary(workdir, capsys):
    assert main(["compress", "input.txt"]) == 0
    err = capsys.readouterr().err
    assert "input.txt" in err and "%" in err  # summary line
    assert main(["-q", "compress", "-f", "input.txt"]) == 0
    assert capsys.readouterr().err == ""


def test_global_flags_after_subcommand(workdir, capsys):
    # clap marks -q/--raw-bytes `global = true`: accepted before or after
    # the subcommand (reference cli/src/args.rs:111-136).
    assert main(["compress", "-f", "input.txt", "-q"]) == 0
    assert capsys.readouterr().err == ""
    assert main(["input.txt", "-q", "-f"]) == 0  # default-compress form
    assert capsys.readouterr().err == ""
    assert main(["list", "input.txt.zst", "--raw-bytes"]) == 0
    out = capsys.readouterr().out
    import re

    assert re.search(r"\b\d{4,}\b", out)  # raw byte counts, no K/M units
    # A pre-subcommand flag still wins when the subparser omits it.
    assert main(["-q", "decompress", "-f", "-o", "out.bin", "input.txt.zst"]) == 0
    assert capsys.readouterr().err == ""


def test_cli_backend_tpu_roundtrip(tmp_path):
    # --backend tpu routes compress/decompress through the batched device
    # archive pipeline (CPU backend in tests; same code path as the chip).
    from .test_decompress import text_data

    src = tmp_path / "in.bin"
    src.write_bytes(text_data(200_000))
    out = tmp_path / "in.bin.zst"
    rt = tmp_path / "rt.bin"
    assert run_cli(["compress", str(src), "-o", str(out), "-f",
                    "--backend", "tpu", "-s", "64K"]) == 0
    assert run_cli(["decompress", str(out), "-o", str(rt), "-f",
                    "--backend", "tpu"]) == 0
    assert rt.read_bytes() == src.read_bytes()
    # patch mode on the tpu backend: create a patch against a prefix and
    # apply it back (reference: lib/src/encode.rs:332-338, decode.rs:212-214)
    newer = tmp_path / "new.bin"
    base = src.read_bytes()
    newer.write_bytes(base[:90_000] + b"INSERTED-PATCH-CHUNK" + base[90_000:])
    patch = tmp_path / "new.patch.zst"
    applied = tmp_path / "applied.bin"
    assert run_cli(["compress", str(newer), "-o", str(patch), "-f",
                    "--backend", "tpu", "-s", "64K",
                    "--patch-from", str(src)]) == 0
    assert run_cli(["decompress", str(patch), "-o", str(applied), "-f",
                    "--backend", "tpu", "--patch-apply", str(src)]) == 0
    assert applied.read_bytes() == newer.read_bytes()
    # the patch must be much smaller than a plain compress of the file
    assert run_cli(["compress", str(newer), "-o", str(out), "-f",
                    "--backend", "tpu", "-s", "64K"]) == 0
    assert patch.stat().st_size < out.stat().st_size / 2
