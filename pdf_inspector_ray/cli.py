"""CLI surface mirroring the reference's binaries plus the Ray job entry.

* ``pdf2md <file> [output] [--json|--raw]`` — /root/reference/src/bin/pdf2md.rs
  (exit 2 when OCR is needed, exit 1 on parse error)
* ``detect <file> [--json]`` — /root/reference/src/bin/detect_pdf.rs
* ``run --input DIR --output DIR [--num-buckets N] [--no-resume]`` — the
  distributed flagship job (usable under ``ray job submit -- python -m
  pdf_inspector_ray.cli run ...``); owns its Ray session (guarded init).

Usage: ``python -m pdf_inspector_ray.cli <command> ...``
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from .pdfi.detect import detect_pdf_type_mem
from .pdfi.objects import PdfError
from .pdfi.process import process_pdf_mem

_TYPE_JSON = {"TextBased": "text_based", "Scanned": "scanned",
              "ImageBased": "image_based", "Mixed": "mixed"}


def cmd_pdf2md(args: argparse.Namespace) -> int:
    try:
        with open(args.pdf_file, "rb") as f:
            buffer = f.read()
        result = process_pdf_mem(buffer)
    except (OSError, PdfError) as e:
        if args.json:
            print(json.dumps({"error": str(e)}))
        else:
            print(f"Error: {e}", file=sys.stderr)
        return 1

    if args.json:
        print(json.dumps({
            "pdf_type": _TYPE_JSON[result.pdf_type],
            "page_count": result.page_count,
            "has_text": result.text is not None,
            "processing_time_ms": result.processing_time_ms,
            "markdown_length": len(result.markdown or ""),
            "markdown": result.markdown or "",
        }))
        return 0
    if result.pdf_type in ("Scanned", "ImageBased"):
        print(f"Error: PDF requires OCR (type: {result.pdf_type})",
              file=sys.stderr)
        return 2
    markdown = result.markdown or ""
    if args.output:
        with open(args.output, "w") as f:
            f.write(markdown)
        print(f"Markdown written to: {args.output}", file=sys.stderr)
    else:
        sys.stdout.write(markdown)
    return 0


def cmd_detect(args: argparse.Namespace) -> int:
    start = time.perf_counter()
    try:
        with open(args.pdf_file, "rb") as f:
            buffer = f.read()
        result = detect_pdf_type_mem(buffer)
    except (OSError, PdfError) as e:
        if args.json:
            print(json.dumps({"error": str(e)}))
        else:
            print(f"Error: {e}", file=sys.stderr)
        return 1
    elapsed_ms = int((time.perf_counter() - start) * 1000)
    if args.json:
        print(json.dumps({
            "pdf_type": _TYPE_JSON[result.pdf_type],
            "page_count": result.page_count,
            "pages_sampled": result.pages_sampled,
            "pages_with_text": result.pages_with_text,
            "confidence": round(result.confidence, 2),
            "title": result.title,
            "ocr_recommended": result.ocr_recommended,
            "detection_time_ms": elapsed_ms,
        }))
    else:
        print(f"Type: {result.pdf_type}")
        print(f"Confidence: {result.confidence * 100:.0f}%")
        print(f"Page count: {result.page_count}")
        print(f"Pages sampled: {result.pages_sampled}")
        print(f"Pages with text: {result.pages_with_text}")
        print(f"OCR recommended: {'YES' if result.ocr_recommended else 'NO'}")
        if result.title:
            print(f"Title: {result.title}")
        print(f"Detection time: {elapsed_ms}ms")
    return 0


def cmd_run(args: argparse.Namespace) -> int:
    import ray

    if not ray.is_initialized():
        ray.init(include_dashboard=False)
    try:
        from .pipelines.flagship import (
            read_transcripts, run_to_partitioned_output, sized_concurrency)

        # fixed pool sized to the cluster (an autoscaling pool is starved
        # by Ray's per-operator reservation under the ordering shuffle);
        # prune the read to the pipeline's input columns
        pool = args.max_actors or sized_concurrency()
        import pyarrow.dataset as pads
        have = pads.dataset(args.input, format="parquet").schema.names
        cols = [c for c in ("conv_id", "turn_idx", "role", "text", "tool",
                            "ts", "pdf_sha256") if c in have]
        ds = read_transcripts(args.input, columns=cols)
        metrics = run_to_partitioned_output(
            ds, args.output,
            num_buckets=args.num_buckets,
            resume=not args.no_resume,
            concurrency=pool)
        print(json.dumps(metrics))
        return 0
    finally:
        ray.shutdown()


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="pdf_inspector_ray")
    sub = parser.add_subparsers(dest="command", required=True)

    p1 = sub.add_parser("pdf2md", help="convert one PDF to markdown")
    p1.add_argument("pdf_file")
    p1.add_argument("output", nargs="?")
    p1.add_argument("--json", action="store_true")
    p1.add_argument("--raw", action="store_true")
    p1.set_defaults(func=cmd_pdf2md)

    p2 = sub.add_parser("detect", help="classify one PDF")
    p2.add_argument("pdf_file")
    p2.add_argument("--json", action="store_true")
    p2.set_defaults(func=cmd_detect)

    p3 = sub.add_parser("run", help="run the flagship Ray job")
    p3.add_argument("--input", required=True)
    p3.add_argument("--output", required=True)
    p3.add_argument("--num-buckets", type=int, default=64)
    p3.add_argument("--max-actors", type=int, default=0,
                    help="fixed actor-pool size; 0 = auto (CPUs - CPUs/4)")
    p3.add_argument("--no-resume", action="store_true")
    p3.set_defaults(func=cmd_run)

    args = parser.parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
