"""Entity extraction operators — Spark twin of the six regex families.

Reference: extractSocialInformation accumulates matches across pages
into shared arrays (/root/reference/custom/social.js:59, :85,
:224-231), then dedups each array first-occurrence-preserving
(:93-98). Here: regexp_extract_all per family (JVM-side, codegen), an
explicit ordering key (page_order, family pass, match index) replaces
"array append order", and the dedup keeps each (seed,kind,value)'s
minimum ordering key via a map-side-combinable groupBy-min, with the
final per-kind ord assigned by a window over the already-deduped rows.
No Python runs in this path at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.entities import (
    EMAIL_POSSESSIVE,
    FAMILIES,
    KIND_ORDER,
    REQUIRED_LITERALS,
)


def _token_scan(pattern, token_pred):
    """Whitespace-token-restricted regex scan: split body on \\s+, run
    the regex only on tokens satisfying token_pred. Exact iff no atom
    of the pattern can consume a \\s character (matches then never span
    tokens, and token order + in-token order == document order) and
    token_pred is implied by every match (mandatory literal). Both the
    tokenizer and the regex run under the same Java regex semantics."""
    return F.flatten(
        F.transform(
            F.filter(F.split(F.col("body"), r"\s+"), token_pred),
            lambda t: F.regexp_extract_all(t, F.lit(pattern), F.lit(0)),
        )
    )


def _email_scan():
    """Email-family fast scan — row-identical to
    regexp_extract_all(body, EMAIL) by two equivalence facts:

    1. EMAIL_POSSESSIVE == EMAIL on every input (see entities.py).
    2. Outside the '"..."' alternation branch, no atom of the pattern
       can consume a \\s character (local-part classes exclude \\s, '@'
       is not \\s, domain atoms are alnum/-/./digit brackets) — under
       the SAME Java \\s semantics the tokenizer below uses. So on
       quote-free bodies every match lies inside one whitespace token,
       in (token order, in-token order) == document order, and only
       tokens containing the mandatory '@' can match at all. Bodies
       containing '"' fall back to the full-body scan.

    The email regex was 76% of the post-guard extraction stage (the
    corpus places '@' near-misses in every body, so the literal guard
    alone never prunes it); the token scan cuts it ~6.6x by scanning
    ~10% of the bytes. The token filter also requires '.' — both
    domain branches contain a mandatory literal dot ('\\[1.2.3.4]' or
    '(x+\\.)+tld'), so a dot-free token ('mail@', '@corp') cannot hold
    a match. Both equivalences are property-tested
    (test_email_possessive_twin_equiv, test_email_token_scan_equiv)
    and the whole plan is parity-tested against the unguarded Python
    twin."""
    body = F.col("body")
    tokenized = _token_scan(
        EMAIL_POSSESSIVE, lambda t: t.contains("@") & t.contains(".")
    )
    return F.when(
        body.contains('"'),
        F.regexp_extract_all(body, F.lit(EMAIL_POSSESSIVE), F.lit(0)),
    ).otherwise(tokenized)


# Waves per core for the extraction scan. The stage's straggler tail
# is ~1/PARTS_PER_CORE of its wall (a pinned local[4] /proc/stat
# timeline showed util dropping to ~0.5 for the last ~4s of the
# depth-1 extraction job at 4 waves — the single biggest idle block in
# a BENCH leg); more waves shrink the tail, more tasks cost scheduler
# overhead. A/B on the BENCH page store (pinned local[4], interleaved
# min-of-3): 8 waves 35.06s vs 4 waves 35.85s vs no-repartition 36.84s
# (file splits are byte-balanced, not cost-balanced, and the local
# round-robin shuffle is nearly free — so the shuffle stays and the
# wave count is what matters). Neutral at 1 core (no tail to shrink),
# so the finer split directly helps the N->4N scaling ratio.
PARTS_PER_CORE = 8


def extract_entities_raw(pages: DataFrame) -> DataFrame:
    """pages: seed_id, page_order (0=seed page, else pop_rank), body.
    Returns seed_id, kind, page_order, match_pos, value — one row per
    regex match, ordered like the reference's array appends.

    Single-plan shape (one pass over body, one codegen unit — NOT a
    6-way self-union, which would rescan the page store per family):
    build array<struct<kind, matches>> then explode twice.

    The input is round-robin repartitioned to PARTS_PER_CORE x core
    count first: regex scanning is CPU-dense and per-row-variable, so
    the handful of uneven AQE-coalesced join partitions it usually
    arrives in leaves cores idle behind stragglers (measured 3.7x
    slower than an even 32-way split at local[8] on the bench corpus).
    The extra body shuffle is cheap relative to the scan it balances."""
    sc = pages.sparkSession.sparkContext
    pages = pages.repartition(sc.defaultParallelism * PARTS_PER_CORE)

    def one_pass(pattern: str, literals: list[str] | None, kind: str = ""):
        if kind == "email":
            rx = _email_scan()
        else:
            # NOT routed through _token_scan even where it would be
            # exact (TOKEN_SCANNABLE families): measured SLOWER for
            # them — interleaved min-of-3 A/B at local[8] on the BENCH
            # corpus, fb+insta+gh only: token scan 9.1s vs plain
            # guarded scan 5.4s. These patterns fail fast (first-char
            # 'h' check) so the split + interpreted ArrayFilter/
            # ArrayTransform overhead exceeds the regex savings; email
            # wins only because '@'-anchored tokens are rare relative
            # to body bytes while its NFA is expensive per byte.
            rx = F.regexp_extract_all(F.col("body"), F.lit(pattern), F.lit(0))
        if literals is None:
            return rx
        # literal-contains prefilter: each pattern has mandatory literal
        # atoms (REQUIRED_LITERALS), so a body containing none of them
        # cannot match and the regex scan is skipped by codegen's lazy
        # CASE WHEN branches. Measured ~1.8x on the extraction stage —
        # the JVM substring probe is ~10x cheaper than the NFA scan.
        guard = F.col("body").contains(literals[0])
        for l in literals[1:]:
            guard = guard | F.col("body").contains(l)
        return F.when(guard, rx).otherwise(F.expr("cast(array() as array<string>)"))

    def matches(kind: str):
        # concat preserves "pattern-pass order within a page"
        # (phones: two regex passes appended, social.js:213-221)
        passes = [
            one_pass(p, lits, kind)
            for p, lits in zip(FAMILIES[kind], REQUIRED_LITERALS[kind])
        ]
        arr = F.concat(*passes) if len(passes) > 1 else passes[0]
        return F.struct(F.lit(kind).alias("kind"), arr.alias("arr"))

    per_kind = pages.select(
        "seed_id",
        "page_order",
        F.explode(F.array(*[matches(k) for k in KIND_ORDER])).alias("e"),
    )
    return per_kind.select(
        "seed_id",
        F.col("e.kind").alias("kind"),
        "page_order",
        F.posexplode("e.arr").alias("match_pos", "value"),
    )


def dedup_entities(raw: DataFrame) -> DataFrame:
    """First-occurrence dedup per (seed, kind) + dense ord assignment
    ([...new Set(arr)], social.js:93-98).

    The first occurrence of a value is its MIN (page_order, match_pos),
    so the dedup is a groupBy-min — Spark plans it with a map-side
    partial aggregate, shrinking the shuffle to one row per distinct
    (seed, kind, value) BEFORE the exchange. The naive twin (window
    row_number()==1) shuffles every raw match row twice; at a 10^10
    frontier where the same entity recurs across millions of pages,
    partial aggregation is the difference between shuffling the match
    stream and shuffling the entity set. Only the dense `ord` window
    still sees a shuffle, over already-deduped rows."""
    first = raw.groupBy("seed_id", "kind", "value").agg(
        F.min(F.struct("page_order", "match_pos")).alias("first_at")
    )
    return first.select(
        "seed_id",
        "kind",
        (
            F.row_number().over(
                Window.partitionBy("seed_id", "kind").orderBy(
                    F.col("first_at.page_order"), F.col("first_at.match_pos")
                )
            )
            - 1
        ).alias("ord"),
        "value",
    )


def seed_page_titles(seed_pages: DataFrame) -> DataFrame:
    """page_title entity: trimmed title of the seed page, skipped when
    empty (social.js:62-65)."""
    return (
        seed_pages.select(
            "seed_id",
            F.lit("page_title").alias("kind"),
            F.lit(0).alias("ord"),
            # full-whitespace strip (\s: tabs/newlines too) — F.trim
            # removes ASCII spaces only, but both twins strip all
            # whitespace (oracle str.strip(), reference JS trim())
            F.regexp_replace(F.col("title"), r"^\s+|\s+$", "").alias("value"),
        )
        .filter(F.col("value").isNotNull() & (F.col("value") != ""))
    )
