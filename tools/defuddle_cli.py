"""Single-document CLI mirroring the reference's `defuddle parse <source>`
(/root/reference/cmd/defuddle/main.go:38-120,131-202,345-388): output-format
switches (--json / --markdown / --md), --property extraction, and --output,
over a local HTML file. Network fetch is out of scope per SURVEY.md §2.1
(the reference's URL path just feeds the same parse), so an http(s) source
is rejected with a clear message.

Usage: python tools/defuddle_cli.py parse <file.html> [-j] [-m] [-p prop] [-o out]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _result_json(result) -> str:
    """Marshal in the reference Result's field order and JSON names
    (types.go:83-91 embedding metadata.Metadata, metadata.go:47-59),
    multiline like jsontext.Multiline(true) (tab indent)."""
    try:
        schema = json.loads(result.schema_org)
    except ValueError:
        schema = None
    out = {
        "title": result.title,
        "description": result.description,
        "domain": result.domain,
        "favicon": result.favicon,
        "image": result.image,
        "parseTime": result.parse_time_ms,
        "published": result.published,
        "author": result.author,
        "site": result.site,
        "schemaOrgData": schema,
        "wordCount": result.word_count,
        "content": result.content,
    }
    # omitempty fields (types.go:86-88)
    if result.content_markdown is not None:
        out["contentMarkdown"] = result.content_markdown
    if result.extractor_type is not None:
        out["extractorType"] = result.extractor_type
    if result.meta_tags:
        out["metaTags"] = result.meta_tags
    return json.dumps(out, ensure_ascii=False, indent="\t")


def _get_property(result, prop: str) -> str:
    """main.go:345-388 getProperty — case-insensitive property switch."""
    prop = prop.lower()
    simple = {
        "content": result.content, "title": result.title,
        "description": result.description, "domain": result.domain,
        "favicon": result.favicon, "image": result.image,
        "author": result.author, "site": result.site,
        "published": result.published,
    }
    if prop in simple:
        return simple[prop]
    if prop == "wordcount":
        return str(result.word_count)
    if prop == "parsetime":
        return str(result.parse_time_ms)
    if prop == "metatags":
        return json.dumps(result.meta_tags, ensure_ascii=False,
                          separators=(",", ":")) if result.meta_tags else ""
    if prop == "schemaorgdata":
        try:
            return json.dumps(json.loads(result.schema_org),
                              ensure_ascii=False, separators=(",", ":"))
        except ValueError:
            return "null"
    if prop == "extractortype":
        return result.extractor_type or ""
    if prop == "contentmarkdown":
        return result.content_markdown or ""
    return ""


def _markdown_content(result, source: str) -> str:
    """main.go:205-232 markdownContent — fall back to re-parsing the
    extracted content wrapped in a body when no markdown was produced."""
    from defuddle_spark.kernel import Options, extract_document
    if result.content_markdown is not None:
        return result.content_markdown
    wrapped = f"<html><body>{result.content}</body></html>"
    retry = extract_document(wrapped, url=source, options=Options(
        markdown=True, separate_markdown=True))
    if retry.error is not None or retry.content_markdown is None:
        return result.content
    return retry.content_markdown


def _write_output(filename: str, content: str) -> None:
    if not filename:
        sys.stdout.write(content)
        return
    with open(filename, "w", encoding="utf-8") as f:
        f.write(content)
    print(f"Output written to {filename}")


def main() -> int:
    ap = argparse.ArgumentParser(prog="defuddle")
    sub = ap.add_subparsers(dest="command", required=True)
    p = sub.add_parser("parse", help="Parse and extract content from an HTML file")
    p.add_argument("source")
    p.add_argument("-j", "--json", action="store_true",
                   help="Output as JSON with metadata and content")
    p.add_argument("-m", "--markdown", action="store_true",
                   help="Convert content to markdown format")
    p.add_argument("--md", action="store_true", help="Alias for --markdown")
    p.add_argument("-p", "--property", default="",
                   help="Extract a specific property (e.g., title, description, domain)")
    p.add_argument("-o", "--output", default="",
                   help="Output file path (default: stdout)")
    p.add_argument("--debug", action="store_true")
    args = ap.parse_args()

    if args.source.startswith(("http://", "https://")):
        print("network fetch is out of scope in this build; pass a local "
              "HTML file (SURVEY.md §2.1)", file=sys.stderr)
        return 1
    if ".." in args.source:  # main.go:308-313 validateFilePath
        print("invalid file path: directory traversal detected", file=sys.stderr)
        return 1
    markdown = args.markdown or args.md
    try:
        with open(args.source, encoding="utf-8") as f:
            html = f.read()
    except OSError as exc:
        print(f"error reading file: {exc}", file=sys.stderr)
        return 1

    from defuddle_spark.kernel import Options, extract_document
    result = extract_document(html, url=args.source, options=Options(
        markdown=markdown, separate_markdown=markdown, debug=args.debug))
    if result.error is not None:
        print(f"error loading content: {result.error}", file=sys.stderr)
        return 1
    if args.debug:
        return 0

    if args.property:
        value = _get_property(result, args.property)
        if value == "":
            print(f'property not found in response: "{args.property}"',
                  file=sys.stderr)
            return 1
        _write_output(args.output, value)
        return 0

    if args.json:
        content = _result_json(result)
    elif markdown:
        content = _markdown_content(result, args.source)
    else:
        content = result.content
    _write_output(args.output, content)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
