"""Command-line interface: ``python -m lz4_tpu``.

Frame-format compress/decompress compatible with the ``lz4`` CLI, plus
hashing and tier inspection (the expanded analog of the reference's
``main()`` debug entries, ``LZ4Factory.java:318-321``).

Examples:
  python -m lz4_tpu compress   input.bin out.lz4 --engine native -B 64KB
  python -m lz4_tpu decompress out.lz4 restored.bin
  python -m lz4_tpu xxh32 input.bin
  python -m lz4_tpu info
"""

from __future__ import annotations

import argparse
import sys
import time


def _block_size(name: str):
    from .formats.frame import BlockSize
    table = {"64KB": BlockSize.SIZE_64KB, "256KB": BlockSize.SIZE_256KB,
             "1MB": BlockSize.SIZE_1MB, "4MB": BlockSize.SIZE_4MB}
    if name not in table:
        raise argparse.ArgumentTypeError(
            f"block size must be one of {list(table)}")
    return table[name]


def cmd_compress(args):
    from .streams import compress_stream
    level = args.level
    if getattr(args, "turbo", False):
        if level > 0:
            raise SystemExit("--turbo and --level are mutually exclusive")
        level = -1
    if args.dict_id is not None and not getattr(args, "dict", None):
        raise SystemExit("--dict-id requires -D/--dict")
    t0 = time.time()
    if getattr(args, "dict", None):
        # dictionary frames route through the frame writer (per-block
        # dict-window seeding; see formats/frame.py)
        if level != 0:
            raise SystemExit("-D supports the default fast level only")
        from .formats.frame import (FrameFlag, Lz4FrameOutputStream,
                                    DEFAULT_FEATURES)
        with open(args.dict, "rb") as f:
            dictionary = f.read()
        feats = DEFAULT_FEATURES if args.no_frame_crc else (
            FrameFlag.BLOCK_INDEPENDENCE, FrameFlag.CONTENT_CHECKSUM)
        with open(args.input, "rb") as src, open(args.output, "wb") as dst:
            w = Lz4FrameOutputStream(dst, block_size=args.block_size,
                                     features=feats, dictionary=dictionary,
                                     dict_id=args.dict_id)
            while True:
                chunk = src.read(1 << 20)
                if not chunk:
                    break
                w.write(chunk)
            w.close_keep_underlying()
            n = dst.tell()
    else:
        with open(args.input, "rb") as src, open(args.output, "wb") as dst:
            n = compress_stream(src, dst, block_size=args.block_size,
                                engine=args.engine,
                                content_checksum=not args.no_frame_crc,
                                level=level)
    dt = time.time() - t0
    import os
    in_size = os.path.getsize(args.input)
    print(f"{args.input}: {in_size} -> {n} bytes "
          f"({n / max(1, in_size) * 100:.2f}%), "
          f"{in_size / max(dt, 1e-9) / 1e6:.1f} MB/s [{args.engine}]")


def cmd_decompress(args):
    t0 = time.time()
    if args.dict:
        # dictionary decode routes through the frame reader (per-block
        # window seeding is serial by nature)
        from .formats.frame import Lz4FrameInputStream
        with open(args.dict, "rb") as f:
            dictionary = f.read()
        with open(args.input, "rb") as src, open(args.output, "wb") as dst:
            reader = Lz4FrameInputStream(
                src, allow_dependent_blocks=args.allow_dependent,
                dictionary=dictionary)
            n = 0
            while True:
                chunk = reader.read(1 << 20)
                if not chunk:
                    break
                dst.write(chunk)
                n += len(chunk)
    else:
        from .streams import decompress_stream
        with open(args.input, "rb") as src, open(args.output, "wb") as dst:
            n = decompress_stream(src, dst, engine=args.engine,
                                  allow_dependent=args.allow_dependent)
    dt = time.time() - t0
    print(f"{args.input}: -> {n} bytes, "
          f"{n / max(dt, 1e-9) / 1e6:.1f} MB/s [{args.engine}]")


def cmd_xxh32(args):
    from .api.factory import XXHashFactory
    f = XXHashFactory.fastest_instance()
    with open(args.input, "rb") as fh:
        s = f.new_streaming_hash32(args.seed)
        while True:
            chunk = fh.read(1 << 20)
            if not chunk:
                break
            s.update(chunk)
    print(f"{s.get_value() & 0xFFFFFFFF:08x}  {args.input}")


def cmd_xxh64(args):
    from .api.factory import XXHashFactory
    f = XXHashFactory.fastest_instance()
    with open(args.input, "rb") as fh:
        s = f.new_streaming_hash64(args.seed)
        while True:
            chunk = fh.read(1 << 20)
            if not chunk:
                break
            s.update(chunk)
    print(f"{s.get_value() & 0xFFFFFFFFFFFFFFFF:016x}  {args.input}")


def cmd_info(args):
    from .api.factory import Lz4Factory, XXHashFactory
    print("tpu-lz4 tiers:")
    for name, ctor in [("safe", Lz4Factory.safe_instance),
                       ("native", Lz4Factory.native_instance),
                       ("pallas", Lz4Factory.pallas_instance)]:
        try:
            ctor()
            status = "ok"
        except Exception as e:
            status = f"unavailable ({type(e).__name__})"
        print(f"  lz4 {name:8s}: {status}")
    print(f"  fastest lz4  : {Lz4Factory.fastest_instance().impl}")
    print(f"  fastest hash : {XXHashFactory.fastest_instance().impl}")
    try:
        import jax
        print(f"  jax devices  : {jax.devices()}")
    except Exception as e:
        print(f"  jax          : unavailable ({e})")


def main(argv=None):
    p = argparse.ArgumentParser(prog="lz4_tpu", description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("compress", help="compress a file into an LZ4 frame")
    c.add_argument("input")
    c.add_argument("output")
    c.add_argument("-B", "--block-size", type=_block_size, default="64KB")
    c.add_argument("--engine", default="fastest",
                   choices=["fastest", "native", "pallas", "sharded", "safe",
                            "parallel"])
    c.add_argument("-l", "--level", type=int, default=0,
                   help="0 = fast scan (default); 1-17 = HC level")
    c.add_argument("--turbo", action="store_true",
                   help="opt-in modern-heuristic fast mode (native tier; "
                        "valid frames, not byte-identical to the default "
                        "algorithm for blocks > 64KB)")
    c.add_argument("-D", "--dict", metavar="FILE",
                   help="compress against a dictionary (writes a "
                        "dictionary frame; lz4 CLI -D analog)")
    c.add_argument("--dict-id", type=lambda v: int(v, 0), default=None,
                   help="record this DictID in the frame header "
                        "(requires -D)")
    c.add_argument("--no-frame-crc", action="store_true",
                   help="omit the content checksum")
    c.set_defaults(fn=cmd_compress)

    d = sub.add_parser("decompress", help="decode LZ4 frame(s)")
    d.add_argument("input")
    d.add_argument("output")
    d.add_argument("--allow-dependent", action="store_true",
                   help="also read linked-block frames (lz4 CLI -BD); "
                        "refused by default, matching lz4-java")
    d.add_argument("-D", "--dict", metavar="FILE",
                   help="dictionary file for dictionary frames "
                        "(lz4 CLI -D); accepts the DictID header field")
    d.add_argument("--engine", default="fastest",
                   choices=["fastest", "native", "pallas", "sharded", "safe"])
    d.set_defaults(fn=cmd_decompress)

    for name, fn in (("xxh32", cmd_xxh32), ("xxh64", cmd_xxh64)):
        h = sub.add_parser(name, help=f"{name} checksum of a file")
        h.add_argument("input")
        h.add_argument("--seed", type=lambda v: int(v, 0), default=0)
        h.set_defaults(fn=fn)

    i = sub.add_parser("info", help="show available tiers and devices")
    i.set_defaults(fn=cmd_info)

    args = p.parse_args(argv)
    try:
        return args.fn(args)
    except BrokenPipeError:
        # downstream consumer (e.g. `| head`) closed the pipe — not an error
        import os
        os.dup2(os.open(os.devnull, os.O_WRONLY), sys.stdout.fileno())
        return 0
    except OSError as e:
        print(f"lz4_tpu: {e}", file=sys.stderr)
        return 1
    except Exception as e:
        from .core.errors import Lz4Error
        if isinstance(e, Lz4Error):
            # clean one-line diagnostics for expected codec/format errors
            # (bad frames, refused engine/level combinations, tight dests)
            print(f"lz4_tpu: error: {e}", file=sys.stderr)
            return 1
        raise


if __name__ == "__main__":
    sys.exit(main())
