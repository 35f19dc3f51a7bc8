"""XPath-subset -> CSS translation for selector configs.

The target system's profile configs are described as "CSS/XPath
selector configs"; the reference's jsoup path only ever consumes CSS,
so XPath support here is a TRANSLATION layer into the same pinned CSS
engine — one matching semantics, two syntaxes. The practical subset
profile authors use:

    //div                       div          (descendant anywhere)
    /html/body/div              html > body > div
    //div/p                     div > p
    //div//p                    div p
    //*[@id='x']                *[id="x"]
    //a[@href]                  a[href]
    //li[3]                     li:nth-of-type(3)
    //li[last()]                li:last-of-type
    //div[contains(@class,'x')] div[class*="x"]
    a//b | c/d                  comma group

A positional predicate AFTER a filter predicate (``//a[@href][2]``)
is rejected: XPath counts among the filtered nodes, CSS
``:nth-of-type`` among all same-tag siblings, and approximating one
with the other silently selects a different element.

Everything else (axes `::`, `..`, `text()`, attribute selection
steps, nested predicates) raises :class:`SelectorParseError` loudly —
same fail-loud contract as unsupported CSS pseudos, never a silent
mis-match. Dialect note: the CSS engine's attribute comparisons are
case-insensitive (jsoup), so translated XPath inherits that.
"""

from __future__ import annotations

import re
from typing import List

from .css import SelectorParseError

__all__ = ["xpath_to_css", "looks_like_xpath"]

_NAME = r"[A-Za-z_][\w.-]*|\*"
_PRED_ATTR_EQ = re.compile(
    r"^@([\w.-]+)\s*=\s*(?:'([^']*)'|\"([^\"]*)\")$"
)
_PRED_ATTR = re.compile(r"^@([\w.-]+)$")
_PRED_POS = re.compile(r"^(\d+)$")
_PRED_CONTAINS = re.compile(
    r"^contains\(\s*@([\w.-]+)\s*,\s*(?:'([^']*)'|\"([^\"]*)\")\s*\)$"
)


def looks_like_xpath(q: str) -> bool:
    s = q.strip()
    return s.startswith("/") or s.startswith(".//")


def _split_steps(xp: str) -> List[str]:
    """Split on '/' outside predicate brackets, keeping '' for the
    empty token between the slashes of '//'."""
    steps, buf, depth = [], [], 0
    for c in xp:
        if c == "[":
            depth += 1
        elif c == "]":
            depth -= 1
            if depth < 0:
                raise SelectorParseError(f"unbalanced ']' in xpath '{xp}'")
        if c == "/" and depth == 0:
            steps.append("".join(buf))
            buf = []
        else:
            buf.append(c)
    if depth != 0:
        raise SelectorParseError(f"unbalanced '[' in xpath '{xp}'")
    steps.append("".join(buf))
    return steps


def _step_to_css(step: str, xp: str) -> str:
    m = re.match(rf"^({_NAME})((?:\[[^\[\]]*\])*)$", step)
    if m is None:
        raise SelectorParseError(
            f"unsupported xpath step '{step}' in '{xp}' (axes, text(), "
            "'..' and nested predicates are outside the subset)"
        )
    name, preds_raw = m.group(1), m.group(2)
    css = name
    saw_filter_pred = False
    for pred in re.findall(r"\[([^\[\]]*)\]", preds_raw):
        pred = pred.strip()
        # XPath [n] counts among nodes matching the PRECEDING predicates,
        # while CSS :nth-of-type counts among ALL same-tag siblings —
        # equal only when [n] is the step's first predicate. A trailing
        # positional after a filter (//a[@href][2]) would silently select
        # a different element, so it is rejected, not approximated.
        if saw_filter_pred and (_PRED_POS.match(pred) or pred == "last()"):
            raise SelectorParseError(
                f"positional predicate '[{pred}]' after a filter "
                f"predicate in '{xp}': XPath counts among filtered "
                "nodes, CSS :nth-of-type among all same-tag siblings "
                "— outside the faithful subset"
            )
        pm = _PRED_ATTR_EQ.match(pred)
        if pm:
            val = pm.group(2) if pm.group(2) is not None else pm.group(3)
            css += f'[{pm.group(1)}="{val}"]'
            saw_filter_pred = True
            continue
        pm = _PRED_CONTAINS.match(pred)
        if pm:
            val = pm.group(2) if pm.group(2) is not None else pm.group(3)
            css += f'[{pm.group(1)}*="{val}"]'
            saw_filter_pred = True
            continue
        pm = _PRED_ATTR.match(pred)
        if pm:
            css += f"[{pm.group(1)}]"
            saw_filter_pred = True
            continue
        pm = _PRED_POS.match(pred)
        if pm:
            css += f":nth-of-type({pm.group(1)})"
            continue
        if pred == "last()":
            css += ":last-of-type"
            continue
        raise SelectorParseError(
            f"unsupported xpath predicate '[{pred}]' in '{xp}'"
        )
    return css


def xpath_to_css(xp: str) -> str:
    """Translate one XPath (or '|' union of XPaths) to the CSS dialect."""
    parts = [p.strip() for p in xp.split("|")]
    return ", ".join(_one_to_css(p) for p in parts if p)


def _one_to_css(xp: str) -> str:
    s = xp.strip()
    if s.startswith(".//"):
        s = "//" + s[3:]
    if "::" in s or "/.." in s or s.endswith("..") or "text()" in s:
        raise SelectorParseError(
            f"unsupported xpath construct in '{xp}' (axes/../text())"
        )
    if not s.startswith("/"):
        raise SelectorParseError(f"xpath must start with '/' : '{xp}'")
    steps = _split_steps(s)
    # steps[0] is '' (leading slash); '' between two slashes marks '//'
    out: List[str] = []
    descendant = False  # combinator for the NEXT named step
    first = True
    for tok in steps[1:]:
        if tok == "":
            descendant = True
            continue
        css = _step_to_css(tok, xp)
        if first:
            # an ABSOLUTE path (/html/...) anchors at the root element;
            # a leading // means "descendant anywhere" — plain CSS
            if not descendant:
                css = f"{css}:root"
            out.append(css)
            first = False
        else:
            out.append(("" if descendant else ">"))
            out.append(css)
        descendant = False
    if not out:
        raise SelectorParseError(f"empty xpath '{xp}'")
    res: List[str] = []
    for item in out:
        if item == ">":
            res.append(" > ")
        elif item == "":
            res.append(" ")
        else:
            res.append(item)
    return "".join(res)
