#!/usr/bin/env python
"""Static documentation site builder (the reference's rendered-site role).

The reference is an nbdev repo whose public face is a quarto site
(_quarto.yml / sidebar.yml / GH-pages deploy). This environment has no
quarto/mkdocs/pdoc, so this builder is dependency-free: a small markdown
renderer for docs/*.md plus API pages generated from the package's own
docstrings and signatures (module -> classes/functions), with a sidebar.

    python tools/build_docs.py [--out site/]

CI deploys `site/` to GH-pages (.github/workflows/docs.yaml).
"""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root

import argparse
import html
import importlib
import inspect
import pkgutil
import re
from pathlib import Path

STYLE = """
body { font-family: -apple-system, 'Segoe UI', Roboto, sans-serif;
       margin: 0; color: #1a1a1a; }
.wrap { display: flex; min-height: 100vh; }
nav { width: 240px; background: #f6f6f4; padding: 1.2rem;
      border-right: 1px solid #e2e2de; flex-shrink: 0; }
nav h2 { font-size: .8rem; text-transform: uppercase; color: #888;
         margin: 1rem 0 .3rem; }
nav a { display: block; color: #2a5d8f; text-decoration: none;
        padding: .12rem 0; font-size: .92rem; }
main { padding: 2rem 3rem; max-width: 60rem; min-width: 0; }
pre { background: #f4f4f2; padding: .8rem 1rem; overflow-x: auto;
      border-radius: 6px; font-size: .85rem; }
code { background: #f4f4f2; padding: .1em .3em; border-radius: 4px;
       font-size: .9em; }
pre code { background: none; padding: 0; }
table { border-collapse: collapse; margin: 1rem 0; }
th, td { border: 1px solid #ddd; padding: .35rem .7rem; font-size: .9rem; }
th { background: #f6f6f4; }
h1, h2, h3 { line-height: 1.25; }
.sig { background: #eef3f8; padding: .5rem .8rem; border-radius: 6px;
       font-family: monospace; font-size: .85rem; white-space: pre-wrap; }
.api-item { margin: 1.6rem 0; border-left: 3px solid #d8e4ef;
            padding-left: 1rem; }
.kind { color: #888; font-size: .75rem; text-transform: uppercase; }
"""


# ------------------------------------------------- tiny markdown renderer --

def md_to_html(text: str) -> str:
    out, in_code, in_list, in_table = [], False, False, False
    para: list[str] = []

    def flush_para():
        if para:
            out.append("<p>" + inline(" ".join(para)) + "</p>")
            para.clear()

    def inline(s: str) -> str:
        s = html.escape(s, quote=False)
        s = re.sub(r"`([^`]+)`", r"<code>\1</code>", s)
        s = re.sub(r"\*\*([^*]+)\*\*", r"<strong>\1</strong>", s)
        s = re.sub(r"(?<!\*)\*([^*\s][^*]*)\*(?!\*)", r"<em>\1</em>", s)
        s = re.sub(r"\[([^\]]+)\]\(([^)]+)\)",
                   lambda m: f'<a href="{m.group(2).replace(".md", ".html")}">'
                             f"{m.group(1)}</a>", s)
        return s

    lines = text.splitlines()
    i = 0
    while i < len(lines):
        ln = lines[i]
        if ln.startswith("```"):
            flush_para()
            if in_code:
                out.append("</code></pre>")
            else:
                out.append("<pre><code>")
            in_code = not in_code
            i += 1
            continue
        if in_code:
            out.append(html.escape(ln))
            i += 1
            continue
        if re.match(r"^\|.*\|\s*$", ln):
            flush_para()
            if not in_table:
                out.append("<table>")
                in_table = "head"
            cells = [c.strip() for c in ln.strip().strip("|").split("|")]
            if all(re.fullmatch(r":?-+:?", c) for c in cells):
                i += 1
                continue
            tag = "th" if in_table == "head" else "td"
            in_table = "body"
            out.append("<tr>" + "".join(
                f"<{tag}>{inline(c)}</{tag}>" for c in cells) + "</tr>")
            i += 1
            continue
        elif in_table:
            out.append("</table>")
            in_table = False
        m = re.match(r"^(#{1,4})\s+(.*)$", ln)
        if m:
            flush_para()
            lvl = len(m.group(1))
            out.append(f"<h{lvl}>{inline(m.group(2))}</h{lvl}>")
        elif re.match(r"^\s*[-*]\s+", ln):
            flush_para()
            if not in_list:
                out.append("<ul>")
                in_list = True
            out.append("<li>" + inline(re.sub(r"^\s*[-*]\s+", "", ln))
                       + "</li>")
        elif not ln.strip():
            flush_para()
            if in_list:
                out.append("</ul>")
                in_list = False
        else:
            if in_list:
                out.append("</ul>")
                in_list = False
            para.append(ln.strip())
        i += 1
    flush_para()
    if in_list:
        out.append("</ul>")
    if in_table:
        out.append("</table>")
    if in_code:
        out.append("</code></pre>")
    return "\n".join(out)


# --------------------------------------------------------- page scaffold --

def page(title: str, body: str, sidebar: str) -> str:
    return f"""<!doctype html><html><head><meta charset="utf-8">
<title>{html.escape(title)} — audio_algebra_tpu</title>
<meta name="viewport" content="width=device-width, initial-scale=1">
<style>{STYLE}</style></head>
<body><div class="wrap"><nav>{sidebar}</nav>
<main>{body}</main></div></body></html>"""


def api_page(modname: str) -> str:
    mod = importlib.import_module(modname)
    parts = [f"<h1><code>{modname}</code></h1>"]
    if mod.__doc__:
        parts.append("<pre>" + html.escape(inspect.cleandoc(mod.__doc__))
                     + "</pre>")
    members = []
    for name, obj in vars(mod).items():
        if name.startswith("_"):
            continue
        if getattr(obj, "__module__", None) != modname:
            continue
        if inspect.isclass(obj) or inspect.isfunction(obj):
            members.append((name, obj))
    for name, obj in members:
        kind = "class" if inspect.isclass(obj) else "function"
        try:
            sig = str(inspect.signature(obj))
        except (ValueError, TypeError):
            sig = "(...)"
        doc = inspect.getdoc(obj) or ""
        item = [f'<div class="api-item"><span class="kind">{kind}</span>'
                f"<h3><code>{name}</code></h3>"
                f'<div class="sig">{html.escape(name + sig)}</div>']
        if doc:
            item.append("<pre>" + html.escape(doc) + "</pre>")
        if inspect.isclass(obj):
            for mname, meth in vars(obj).items():
                if mname.startswith("_") or not inspect.isfunction(meth):
                    continue
                mdoc = inspect.getdoc(meth) or ""
                try:
                    msig = str(inspect.signature(meth))
                except (ValueError, TypeError):
                    msig = "(...)"
                item.append(f"<h4><code>.{mname}</code></h4>"
                            f'<div class="sig">'
                            f"{html.escape(mname + msig)}</div>")
                if mdoc:
                    item.append("<pre>" + html.escape(mdoc) + "</pre>")
        item.append("</div>")
        parts.append("".join(item))
    return "\n".join(parts)


def discover_modules(pkg: str) -> list[str]:
    root = importlib.import_module(pkg)
    mods = [pkg]
    for info in pkgutil.walk_packages(root.__path__, prefix=pkg + "."):
        if ".pallas" in info.name or info.name.endswith("__main__"):
            continue        # kernels are documented via docs/performance.md;
                            # a __main__ submodule would EXECUTE on import
        mods.append(info.name)
    return sorted(mods)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="site")
    ap.add_argument("--package", default="audio_algebra_tpu")
    args = ap.parse_args()
    out = Path(args.out)
    (out / "api").mkdir(parents=True, exist_ok=True)

    docs = sorted(Path("docs").glob("*.md"))
    extra = [p for p in (Path("README.md"), Path("BASELINE.md"),
                         Path("PARITY.md")) if p.exists()]
    mods = []
    for m in discover_modules(args.package):
        try:
            importlib.import_module(m)
            mods.append(m)
        except Exception as e:       # optional deps may be absent in CI
            print(f"skip {m}: {e}")

    def sidebar(depth: int = 0) -> str:
        pre = "../" * depth
        s = [f'<h2>Guide</h2><a href="{pre}index.html">Home</a>']
        for p in docs:
            if p.stem != "index":
                s.append(f'<a href="{pre}{p.stem}.html">'
                         f"{p.stem.replace('_', ' ').title()}</a>")
        for p in extra:
            s.append(f'<a href="{pre}{p.stem.lower()}.html">{p.stem}</a>')
        s.append("<h2>API</h2>")
        for m in mods:
            label = m.replace(args.package, "aa_tpu")
            s.append(f'<a href="{pre}api/{m}.html">{label}</a>')
        return "\n".join(s)

    for p in docs:
        name = "index" if p.stem == "index" else p.stem
        (out / f"{name}.html").write_text(
            page(p.stem, md_to_html(p.read_text()), sidebar()))
    for p in extra:
        (out / f"{p.stem.lower()}.html").write_text(
            page(p.stem, md_to_html(p.read_text()), sidebar()))
    for m in mods:
        (out / "api" / f"{m}.html").write_text(
            page(m, api_page(m), sidebar(depth=1)))
    n = len(docs) + len(extra) + len(mods)
    print(f"wrote {n} pages to {out}/")


if __name__ == "__main__":
    main()
