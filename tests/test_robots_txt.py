"""src_robots_txt: parsing the raw robots.txt text must reproduce the
structured robots rules table the CrawlEngine joins against (both are
rendered from the same deterministic rule stream, so any parser bug
breaks the tie)."""

from pyspark.sql import functions as F


def test_parsed_text_matches_structured_rules(spark):
    from scrapeulous_spark.operators import load_all_catalogs
    from scrapeulous_spark.sources.corpus import SMOKE, ensure_corpus

    parsed = load_all_catalogs()["src_robots_txt"].spark(spark, "unused").collect()
    rules = {
        r.host: r
        for r in spark.read.parquet(ensure_corpus(SMOKE)["robots"]).collect()
    }

    star_dis: dict[str, list[str]] = {}
    star_delay: dict[str, int] = {}
    for r in parsed:
        if r.agent != "*":
            assert r.agent == "badbot" and r.directive == "disallow" and r.value == "/"
            continue
        if r.directive == "disallow":
            star_dis.setdefault(r.host, []).append(r.value)
        elif r.directive == "crawl-delay":
            star_delay[r.host] = r.delay_ms

    assert set(star_delay) == set(rules), "every host must carry a crawl-delay"
    for host, rule in rules.items():
        assert star_dis.get(host, []) == list(rule.disallow)
        assert star_delay[host] == rule.crawl_delay_ms


def test_parser_ignores_comments_and_sitemap(spark):
    from scrapeulous_spark.operators import load_all_catalogs
    from scrapeulous_spark.sources.corpus import SMOKE, ensure_robots_txt

    texts = spark.read.parquet(ensure_robots_txt(SMOKE))
    assert texts.filter(F.col("robots_txt").contains("Sitemap:")).count() > 0
    parsed = load_all_catalogs()["src_robots_txt"].spark(spark, "unused")
    assert parsed.filter(F.lower("directive") == "sitemap").count() == 0
    assert parsed.filter(F.col("value").contains("robots for")).count() == 0
