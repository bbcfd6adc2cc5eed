"""Gold layer: star-schema builders (SURVEY.md §2.2-§2.4, §7.2 step 5).

One fact + six dimensions, re-expressing the reference's gold job
(reference glue_scripts/gold_data_curation_script.py:59-232)
Spark-first:

- joins keep the reference's left-outer semantics (J1-J4) with
  explicit broadcast hints on the genuinely-small dimensions
  (categories, quote_response aggregates) — at 100 TB the fact-side
  tables shuffle-hash on their keys while dims broadcast;
- the date dimension is generated with sequence()+explode (F5/F6),
  never collected to the driver;
- fact/dim writes partition by (year, month)
  (reference :83-84,144-145) so date-range queries partition-prune.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def fact_booking(bookings: DataFrame, quote_response: DataFrame) -> DataFrame:
    """reference gold_data_curation_script.py:59-88 (J1, P1, P4, P7, F1).

    No broadcast hint on quote_response: it grows 1:1 with bookings, so
    at scale this is a large-large key equi-join — AQE broadcasts it
    only while it actually fits, and shuffle-joins (with skew split)
    beyond that."""
    b = bookings.alias("b")
    qr = quote_response.alias("qr")
    return (
        b.join(qr, F.col("b.quote_id") == F.col("qr.quote_response_id"), "left")
        .select(
            F.col("b.booking_id").alias("booking_id"),
            F.col("b.user_id").alias("user_id"),
            F.col("b.provider_id").alias("provider_id"),
            F.col("b.service_id").alias("service_id"),
            F.col("b.category_id").alias("category_id"),
            F.col("b.quote_id").alias("quote_id"),
            F.date_format(F.col("b.created_at"), "yyyyMMdd").cast("int").alias("date_key"),
            F.col("qr.sub_total").alias("amount_before_tax"),
            F.col("qr.tax").alias("tax_amount"),
            F.col("qr.total").alias("total_amount"),
            F.col("b.status").alias("booking_status"),
            F.col("b.location").alias("location"),
            F.col("b.created_at").alias("created_at"),
        )
        .withColumn("year", F.year("created_at"))
        .withColumn("month", F.month("created_at"))
        .filter(F.col("booking_id").isNotNull())
    )


def dim_date(spark: SparkSession, start: str = "2024-01-01", end: str = "2025-12-31") -> DataFrame:
    """reference gold_data_curation_script.py:90-111 (F2, F3, F5, F6, P9)."""
    days = spark.range(1).select(
        F.explode(
            F.sequence(F.to_date(F.lit(start)), F.to_date(F.lit(end)), F.expr("interval 1 day"))
        ).alias("date")
    )
    return days.select(
        F.date_format("date", "yyyyMMdd").cast("int").alias("date_key"),
        F.col("date"),
        F.year("date").alias("year"),
        F.quarter("date").alias("quarter"),
        F.month("date").alias("month"),
        F.date_format("date", "MMMM").alias("month_name"),
        F.dayofmonth("date").alias("day_of_month"),
        F.dayofweek("date").alias("day_of_week"),
        F.date_format("date", "EEEE").alias("day_name"),
        F.col("date").cast("string").alias("full_date"),
        F.dayofweek("date").isin([7, 1]).alias("is_weekend"),
    )


def dim_user(users: DataFrame, service_providers: DataFrame) -> DataFrame:
    """reference gold_data_curation_script.py:113-145 (J2, P2, P5, P6)."""
    u = users.alias("u")
    sp = service_providers.alias("sp")
    return (
        u.join(sp, F.col("u.user_id") == F.col("sp.user_id"), "left")
        .select(
            F.col("u.user_id").alias("user_id"),
            F.col("u.email").alias("email"),
            F.col("u.first_name").alias("first_name"),
            F.col("u.last_name").alias("last_name"),
            F.col("u.role").alias("role"),
            F.col("u.status").alias("user_status"),
            F.col("u.phone_number").alias("phone_number"),
            F.col("sp.provider_id").alias("provider_id"),
            F.col("sp.business_name").alias("business_name"),
            F.col("sp.location").alias("provider_location"),
            F.col("sp.pricing").alias("pricing_model"),
            F.col("sp.verification_status").alias("verification_status"),
            F.col("sp.is_ai_generated").alias("is_ai_generated"),
            F.col("u.created_at").alias("created_at"),
        )
        .withColumn("full_name", F.concat(F.col("first_name"), F.lit(" "), F.col("last_name")))
        .drop("first_name", "last_name")
        .withColumn("year", F.year("created_at"))
        .withColumn("month", F.month("created_at"))
    )


def dim_service(quote_response: DataFrame, categories: DataFrame) -> DataFrame:
    """reference gold_data_curation_script.py:147-167 (J3, P3).

    The reference derives its service dim from quote_response joined
    to categories on service_type (a category id held as string)."""
    qr = quote_response.alias("qr")
    c = categories.alias("c")
    return (
        qr.join(
            F.broadcast(c),
            F.col("qr.service_type").cast("long") == F.col("c.category_id"),
            "left",
        )
        .select(
            F.col("qr.quote_response_id").alias("service_id"),
            F.col("qr.provider_id").alias("provider_id"),
            F.col("qr.status").alias("quote_status"),
            F.col("c.category_id").alias("category_id"),
            F.col("c.category_name").alias("category_name"),
            F.col("c.status").alias("category_status"),
        )
    )


def dim_location(service_providers: DataFrame) -> DataFrame:
    """reference gold_data_curation_script.py:169-185 (A7, P3, P7)."""
    return (
        service_providers.select(
            F.col("name").alias("location_name"),
            F.col("location").alias("city"),
            F.col("latitude"),
            F.col("longitude"),
        )
        .filter(F.col("location_name").isNotNull())
        .distinct()
    )


def dim_dispute(dispute_requests: DataFrame) -> DataFrame:
    """reference gold_data_curation_script.py:187-205 (P3, P7)."""
    return dispute_requests.select(
        F.col("dispute_id"),
        F.col("booking_id"),
        F.col("review_id"),
        F.col("user_id"),
        F.col("reason"),
        F.col("status").alias("dispute_status"),
        F.col("created_at").alias("reported_at"),
    ).filter(F.col("dispute_id").isNotNull())


def dim_review(provider_reviews: DataFrame, feedback_sentiment: DataFrame) -> DataFrame:
    """reference gold_data_curation_script.py:207-228 (J4, P3)."""
    pr = provider_reviews.alias("pr")
    fs = feedback_sentiment.alias("fs")
    return pr.join(fs, F.col("pr.review_id") == F.col("fs.id"), "left").select(
        F.col("pr.review_id").alias("review_id"),
        F.col("pr.provider_id").alias("provider_id"),
        F.col("pr.user_id").alias("user_id"),
        F.col("pr.rating").alias("rating"),
        F.col("pr.comment").alias("comment"),
        F.col("pr.is_anonymous").alias("is_anonymous"),
        F.col("fs.sentiment_label").alias("sentiment_label"),
        F.col("fs.sentiment_score").alias("sentiment_score"),
        F.col("fs.is_suspicious").alias("is_suspicious"),
        F.col("pr.created_at").alias("created_at"),
    )


def build_star_schema(spark: SparkSession, silver: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """All star-schema tables from silver inputs (reference gold job main)."""
    return {
        "fact_booking": fact_booking(silver["bookings"], silver["quote_response"]),
        "dim_date": dim_date(spark),
        "dim_user": dim_user(silver["users"], silver["service_providers"]),
        "dim_service": dim_service(silver["quote_response"], silver["categories"]),
        "dim_location": dim_location(silver["service_providers"]),
        "dim_dispute": dim_dispute(silver["dispute_requests"]),
        "dim_review": dim_review(silver["provider_reviews"], silver["feedback_sentiment"]),
    }


PARTITIONED_GOLD = {"fact_booking": ["year", "month"], "dim_user": ["year", "month"]}


def write_gold(gold: dict[str, DataFrame], base_dir: str) -> None:
    """Partitioned parquet sinks (S5/S6; reference :83-84,111,144-145…)."""
    for name, df in gold.items():
        writer = df.write.mode("overwrite")
        if name in PARTITIONED_GOLD:
            writer = writer.partitionBy(*PARTITIONED_GOLD[name])
        writer.parquet(f"{base_dir}/{name}")
