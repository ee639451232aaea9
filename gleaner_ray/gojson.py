"""Go ``encoding/json``-compatible marshaling.

The reference engine re-serializes JSON values with Go's ``json.Marshal``
in two places that leak into observable output bytes:

- graph-array explosion re-marshals each array element
  (``internal/summoner/acquire/jsonutils.go:51``), and
- ``sjson.Set`` marshals replacement values (maps / strings) before
  splicing them into the document
  (``jsonutils.go:136,148,164,275-277``).

To keep the per-row "byte-identical JSON-LD text" invariant we reproduce
Go's byte layout: object keys sorted byte-wise, compact separators,
HTML-unsafe escaping (``<``, ``>``, ``&`` -> ``\\u003c`` etc.,
U+2028/U+2029 escaped), UTF-8 passthrough otherwise, and Go's float64
formatting ('f' notation for 1e-6 <= |x| < 1e21, else 'e' notation with
minimal exponent digits).
"""

from __future__ import annotations

import math

__all__ = ["marshal", "marshal_string", "format_float"]

# Go escapes controls plus <, >, & (SetEscapeHTML(true), the default).
_STR_ESCAPES = {
    '"': '\\"',
    "\\": "\\\\",
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
    "<": "\\u003c",
    ">": "\\u003e",
    "&": "\\u0026",
    " ": "\\u2028",
    " ": "\\u2029",
}
for _c in range(0x20):
    _STR_ESCAPES.setdefault(chr(_c), "\\u%04x" % _c)


_STR_TRANSLATE = {ord(k): v for k, v in _STR_ESCAPES.items()}


def marshal_string(s: str) -> str:
    """Serialize a string exactly as Go json.Marshal does.

    str.translate runs the whole escape map in C — one pass, no
    per-character Python loop."""
    return '"' + s.translate(_STR_TRANSLATE) + '"'


def format_float(f: float) -> str:
    """Format a float64 the way Go's encoding/json does.

    Go uses strconv.AppendFloat(f, fmt, -1, 64) (shortest round-trip)
    with fmt='f' unless |f| < 1e-6 or |f| >= 1e21, where fmt='e' (and a
    leading zero in a 1-digit exponent is dropped: "1e-09" -> "1e-9").
    """
    if math.isnan(f) or math.isinf(f):
        raise ValueError("json: unsupported value: %r" % f)
    if f == int(f) and abs(f) < 1e16:
        # shortest 'f' representation of an integral float is the integer
        return str(int(f))
    if f == int(f) and abs(f) < 1e21:
        # >=1e16 integral: zero-extended shortest repr unless it fails to
        # round-trip, then the exact integer (what Go's 'f' -1 prints)
        r = repr(f)
        if "e" in r or "E" in r:
            mant, _, exp = r.lower().partition("e")
            neg = mant.startswith("-")
            mant = mant.lstrip("-").replace(".", "")
            s = ("-" if neg else "") + mant + "0" * (int(exp) - (len(mant) - 1))
            if float(s) == f:
                return s
        return str(int(f))
    r = repr(f)  # shortest round-trip, possibly scientific
    use_e = f != 0 and (abs(f) < 1e-6 or abs(f) >= 1e21)
    if "e" in r or "E" in r:
        mant, _, exp = r.lower().partition("e")
        exp_i = int(exp)
        if use_e:
            sign = "+" if exp_i >= 0 else "-"
            return "%se%s%d" % (mant, sign, abs(exp_i))
        # expand scientific notation into fixed notation
        neg = mant.startswith("-")
        mant = mant.lstrip("-")
        int_part, _, frac_part = mant.partition(".")
        digits = int_part + frac_part
        point = len(int_part) + exp_i
        if point <= 0:
            s = "0." + "0" * (-point) + digits
        elif point >= len(digits):
            s = digits + "0" * (point - len(digits))
        else:
            s = digits[:point] + "." + digits[point:]
        return ("-" if neg else "") + s.rstrip(".")
    if use_e:
        # repr gave fixed notation but Go wants scientific: normalize
        mant, exp_i = _to_sci(r)
        sign = "+" if exp_i >= 0 else "-"
        return "%se%s%d" % (mant, sign, abs(exp_i))
    return r


def _to_sci(fixed: str) -> tuple[str, int]:
    neg = fixed.startswith("-")
    s = fixed.lstrip("-")
    int_part, _, frac_part = s.partition(".")
    all_digits = int_part + frac_part
    lead_zeros = len(all_digits) - len(all_digits.lstrip("0"))
    exp = len(int_part) - 1 - lead_zeros
    digits = all_digits.lstrip("0").rstrip("0") or "0"
    mant = digits[0] + ("." + digits[1:] if len(digits) > 1 else "")
    return ("-" if neg else "") + mant, exp


def marshal(value) -> str:
    """Go json.Marshal over the Python analogue of map[string]interface{}."""
    out: list[str] = []
    _marshal(value, out)
    return "".join(out)


def _marshal(v, out: list[str]) -> None:
    if v is None:
        out.append("null")
    elif v is True:
        out.append("true")
    elif v is False:
        out.append("false")
    elif isinstance(v, str):
        out.append(marshal_string(v))
    elif isinstance(v, int):
        out.append(str(v))
    elif isinstance(v, float):
        out.append(format_float(v))
    elif isinstance(v, dict):
        out.append("{")
        first = True
        # Go sorts map keys byte-wise (UTF-8 encoding order)
        for k in sorted(v.keys(), key=lambda s: s.encode("utf-8")):
            if not first:
                out.append(",")
            first = False
            out.append(marshal_string(k))
            out.append(":")
            _marshal(v[k], out)
        out.append("}")
    elif isinstance(v, (list, tuple)):
        out.append("[")
        for i, item in enumerate(v):
            if i:
                out.append(",")
            _marshal(item, out)
        out.append("]")
    else:
        raise TypeError("json: unsupported type: %r" % type(v))
