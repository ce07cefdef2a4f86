#!/usr/bin/env python
"""Insert rendered figure directives into the examples gallery pages.

For each docs/source/examples/ex<NN>_*.rst with rendered figures in
docs/source/_static/ex<NN>_*.png, add an ``.. image::`` block after the
intro paragraph (before the ``Run it with::`` line) unless one is
already present.  Idempotent.
"""

import pathlib
import re

HERE = pathlib.Path(__file__).resolve().parent.parent
STATIC = HERE / "docs" / "source" / "_static"
GALLERY = HERE / "docs" / "source" / "examples"


def main():
    changed = 0
    for rst in sorted(GALLERY.glob("ex*.rst")):
        m = re.match(r"ex(\d+)_", rst.name)
        if not m:
            continue
        nn = m.group(1)
        figs = sorted(STATIC.glob(f"ex{nn}_*.png"))
        if not figs:
            continue
        text = rst.read_text()
        if ".. image::" in text:
            continue
        block = "\n".join(
            f".. image:: ../_static/{f.name}\n   :width: 620px\n"
            for f in figs
        )
        anchor = "Run it with::"
        if anchor in text:
            text = text.replace(anchor, block + "\n" + anchor, 1)
        else:
            text = text.rstrip() + "\n\n" + block
        rst.write_text(text)
        changed += 1
        print(f"{rst.name}: {len(figs)} figure(s) inserted")
    print(f"{changed} pages updated")


if __name__ == "__main__":
    main()
