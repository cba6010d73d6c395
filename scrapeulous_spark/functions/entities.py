"""The six social-entity regex families, pinned to the reference.

Patterns transcribed from /root/reference/custom/social.js:145-222
(email :146-148, instagram :157-159, facebook :169-171, twitter
:181-183, github :193-195, phones :205-211). The same pattern strings
feed Python ``re`` (serial oracle) and Spark ``regexp_extract_all``
(engine) — both use non-overlapping left-to-right matching like JS
``String.match(/g)``, so results agree.

Note the reference's idiosyncrasies are preserved deliberately:
``[A-z]`` (which also matches ``[\\]^_`` + backtick), the ``(?!p/)`` /
``(?!share\\.php)`` / ``(?!intent/)`` exclusions, and that linkedin is
declared in the result dict but never extracted (social.js:27 vs
:224-231).
"""

from __future__ import annotations

import re

EMAIL = (
    r'(([^<>()\[\]\\.,;:\s@"]+(\.[^<>()\[\]\\.,;:\s@"]+)*)|(".+"))'
    r"@((\[[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}])|(([a-zA-Z\-0-9]+\.)+[a-zA-Z]{2,}))"
)
INSTAGRAM = (
    r"https?://(www\.)?instagram\.com/(?!p/)"
    r"([A-Za-z0-9_](?:(?:[A-Za-z0-9_]|(?:\.(?!\.))){0,28}(?:[A-Za-z0-9_]))?)"
)
FACEBOOK = r"http(s)?://(www\.)?(facebook|fb)\.com/(?!share\.php)[A-z0-9_\-\.]+/?"
TWITTER = r"http(s)?://(.*\.)?twitter\.com/(?!intent/)[A-z0-9_]{1,100}/?"
GITHUB = r"http(s)?://(www\.)?github\.com/[A-z0-9_-]+/?"
PHONE_DE = r"\(?\+\(?49\)?[ ()]?([- ()]?\d[- ()]?){10}"
PHONE_GENERIC = r"[\+]?[(]?[0-9]{3}[)]?[-\s\.]?[0-9]{3}[-\s\.]?[0-9]{4,6}"

# kind -> list of patterns applied in order, matches concatenated
# (phones: two regex passes appended, social.js:213-221)
FAMILIES: dict[str, list[str]] = {
    "email": [EMAIL],
    "phone": [PHONE_DE, PHONE_GENERIC],
    "facebook": [FACEBOOK],
    "twitter": [TWITTER],
    "instagram": [INSTAGRAM],
    "github": [GITHUB],
}

# Possessive twin of EMAIL for the Spark scan (java.util.regex and
# Python >=3.11 both support '++'/'*+'). Result-identical to EMAIL on
# every input: the local-part classes exclude both '.' and '@', so when
# the greedy attempt fails at the '@' check, giving characters back can
# only re-try '@' against a char from the class or a '.' — never '@'.
# The domain half keeps ordinary greedy quantifiers (its outer group
# genuinely needs giveback, e.g. 'a.bc' must split as 'a.' + 'bc').
# Equivalence is property-tested (test_email_possessive_twin_equiv).
EMAIL_POSSESSIVE = (
    r'(([^<>()\[\]\\.,;:\s@"]++(\.[^<>()\[\]\\.,;:\s@"]++)*+)|(".+"))'
    r"@((\[[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}])|(([a-zA-Z\-0-9]+\.)+[a-zA-Z]{2,}))"
)

# kind -> per-pattern-pass literal prefilters: every possible match of
# the pattern contains at least ONE of the listed literals (they are
# mandatory literal atoms of the regex — the '/' after '.com' is
# mandatory in all three URL families, `\.com/`), so `any(lit in body)`
# false implies zero matches and the backtracking scan can be skipped
# entirely. None = no usable literal (generic phone needs only any 3
# digits). This is a pure pruning device — results are provably
# identical with or without it (tests/test_properties.py::
# test_guard_literals_sound; tests/test_corpus_oracle.py::
# test_guarded_spark_extraction_matches_python_twin).
REQUIRED_LITERALS: dict[str, list[list[str] | None]] = {
    "email": [["@"]],
    "phone": [["+"], None],
    "facebook": [["facebook.com/", "fb.com/"]],
    "twitter": [["twitter.com"]],
    "instagram": [["instagram.com/"]],
    "github": [["github.com/"]],
}

# accumulation order across kinds follows extractSocialInformation
# (social.js:224-231): emails, phones, facebook, twitter, instagram, github
KIND_ORDER = ["email", "phone", "facebook", "twitter", "instagram", "github"]

_COMPILED = {k: [re.compile(p) for p in pats] for k, pats in FAMILIES.items()}


def extract_py(kind: str, html: str) -> list[str]:
    """Python twin: full-match strings in document order, per pattern pass."""
    out: list[str] = []
    for rx in _COMPILED[kind]:
        out.extend(m.group(0) for m in rx.finditer(html))
    return out
