"""CLI format-switch surface (tools/defuddle_cli.py vs cmd/defuddle/main.go)."""

import json
import subprocess
import sys

CLI = ["python", "/root/repo/tools/defuddle_cli.py", "parse"]

PAGE = """<html><head><title>CLI Test</title><meta name="author" content="Ann Writer">
</head><body><nav>menu</nav><article><h1>CLI Test</h1><p>Body paragraph for the command line tool.</p></article></body></html>"""


def _page(tmp_path):
    f = tmp_path / "page.html"
    f.write_text(PAGE)
    return str(f)


def _run(*args):
    return subprocess.run([*CLI, *args], capture_output=True, text=True)


def test_default_outputs_content(tmp_path):
    r = _run(_page(tmp_path))
    assert r.returncode == 0
    assert r.stdout == "<p>Body paragraph for the command line tool.</p>"


def test_property_switch(tmp_path):
    p = _page(tmp_path)
    assert _run(p, "-p", "title").stdout == "CLI Test"
    assert _run(p, "-p", "wordcount").stdout == "7"
    assert _run(p, "-p", "author").stdout == "Ann Writer"
    missing = _run(p, "-p", "bogus")
    assert missing.returncode == 1 and "property not found" in missing.stderr


def test_json_field_names_and_order(tmp_path):
    r = _run(_page(tmp_path), "--json")
    data = json.loads(r.stdout)
    # reference Result field order: embedded Metadata then content
    assert list(data)[:5] == ["title", "description", "domain", "favicon", "image"]
    assert data["wordCount"] == 7 and data["content"].startswith("<p>")
    assert "\t" in r.stdout  # jsontext.Multiline(true) shape


def test_markdown_switch_and_output_file(tmp_path):
    p = _page(tmp_path)
    r = _run(p, "--md")
    assert "Body paragraph for the command line tool." in r.stdout
    out = tmp_path / "o.txt"
    r = _run(p, "-o", str(out))
    assert f"Output written to {out}" in r.stdout
    assert out.read_text() == "<p>Body paragraph for the command line tool.</p>"


def test_traversal_and_url_rejected(tmp_path):
    assert _run("../etc/passwd").returncode == 1
    assert _run("https://example.test/x").returncode == 1
