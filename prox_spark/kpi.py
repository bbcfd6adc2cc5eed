"""Analyst KPI queries (SURVEY.md §2.3-§2.6; reference sql/*).

Each KPI is a DataFrame builder over silver tables, re-expressing the
reference's Redshift SQL (reference sql/admin_kip_script:1-36,
sql/service_provider_kpis:1-36, sql/service_seeker_kpis:1-10).
Join strategy notes (scale):

- all joins are key equi-joins; the small sides (services,
  categories, service_providers) broadcast, so only the large fact
  side (bookings / payment_records) streams — no shuffle of the big
  table for the 3-way chains;
- top-k uses orderBy+limit which Spark plans as
  TakeOrderedAndProject (true top-k, no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bookings_per_location_service(bookings: DataFrame, services: DataFrame,
                                  service_providers: DataFrame) -> DataFrame:
    """A1/J5: bookings per (provider location, service name)
    (reference sql/service_provider_kpis:1-10)."""
    # project the fact side to its join key first: bookings also carries
    # a (v2) provider_id column, and the reference KPI resolves provider
    # through services (v1 semantics: s.provider_id)
    return (
        bookings.select("booking_id", "service_id")
        .join(F.broadcast(services.select("service_id", "provider_id", "service_name")),
              "service_id")
        .join(F.broadcast(service_providers.select("provider_id", "location")),
              "provider_id")
        .groupBy("location", "service_name")
        .agg(F.count(F.lit(1)).alias("total_bookings"))
        .orderBy(F.desc("total_bookings"), "location", "service_name")
    )


def avg_rating_per_provider(service_providers: DataFrame, provider_reviews: DataFrame) -> DataFrame:
    """A2/J9 (reference sql/service_provider_kpis:12-17,
    sql/service_seeker_kpis:1-10)."""
    return (
        provider_reviews.join(F.broadcast(service_providers), "provider_id")
        .groupBy("provider_id", "business_name", "location")
        .agg(F.round(F.avg("rating"), 2).alias("avg_rating"),
             F.count(F.lit(1)).alias("n_reviews"))
        .orderBy(F.desc("avg_rating"), "provider_id")
    )


def monthly_revenue_per_provider(payment_records: DataFrame, bookings: DataFrame,
                                 services: DataFrame) -> DataFrame:
    """A3/J6: month x provider revenue (reference
    sql/service_provider_kpis:19-28). Only paid records count."""
    return (
        payment_records.filter(F.col("status") == "paid")
        .select("booking_id", "amount", "created_at")
        .join(bookings.select("booking_id", "service_id"), "booking_id")
        .join(F.broadcast(services.select("service_id", "provider_id")), "service_id")
        .groupBy(F.date_trunc("month", F.col("created_at")).alias("month"),
                 "provider_id")
        .agg(F.sum("amount").alias("revenue"))
        .orderBy("month", "provider_id")
    )


def pct_ai_generated(service_providers: DataFrame) -> DataFrame:
    """A4: conditional aggregation percentage (reference
    sql/service_provider_kpis:30-36)."""
    return service_providers.agg(
        F.round(
            100.0
            * F.sum(F.when(F.col("is_ai_generated"), 1).otherwise(0))
            / F.count(F.lit(1)),
            2,
        ).alias("pct_ai_generated")
    )


def top5_booked_categories_this_week(bookings: DataFrame, services: DataFrame,
                                     categories: DataFrame,
                                     anchor: str | None = None) -> DataFrame:
    """J7/P8/T2 (reference sql/admin_kip_script:1-11): bookings since
    the start of the ISO week containing ``anchor`` (default: today —
    the reference's CURRENT_DATE semantics), top-5 categories. The
    anchor parameter makes the KPI testable against fixed fixtures
    (mirrors q14_orders_since_week)."""
    anchor_col = F.lit(anchor).cast("date") if anchor is not None else F.current_date()
    return (
        bookings.filter(
            F.col("scheduled_date") >= F.date_trunc("week", anchor_col)
        )
        .select("booking_id", "service_id")
        .join(F.broadcast(services.select("service_id", "category_id")), "service_id")
        .join(F.broadcast(categories.select("category_id", "category_name")), "category_id")
        .groupBy("category_name")
        .agg(F.count(F.lit(1)).alias("total_bookings"))
        .orderBy(F.desc("total_bookings"), "category_name")
        .limit(5)
    )


def top5_providers_by_bookings(bookings: DataFrame, services: DataFrame,
                               service_providers: DataFrame) -> DataFrame:
    """J5/T2 (reference sql/admin_kip_script:13-23)."""
    return (
        bookings.select("booking_id", "service_id")
        .join(F.broadcast(services.select("service_id", "provider_id")), "service_id")
        .join(F.broadcast(service_providers.select("provider_id", "business_name")), "provider_id")
        .groupBy("provider_id", "business_name")
        .agg(F.count(F.lit(1)).alias("total_bookings"))
        .orderBy(F.desc("total_bookings"), "provider_id")
        .limit(5)
    )


def top5_disputed_providers(dispute_requests: DataFrame, bookings: DataFrame,
                            services: DataFrame, service_providers: DataFrame) -> DataFrame:
    """A5/J8/T2: 4-way chain (reference sql/admin_kip_script:25-36)."""
    return (
        dispute_requests.select("dispute_id", "booking_id")
        .join(bookings.select("booking_id", "service_id"), "booking_id")
        .join(F.broadcast(services.select("service_id", "provider_id")), "service_id")
        .join(F.broadcast(service_providers.select("provider_id", "business_name")), "provider_id")
        .groupBy("provider_id", "business_name")
        .agg(F.count(F.lit(1)).alias("dispute_count"))
        .orderBy(F.desc("dispute_count"), "provider_id")
        .limit(5)
    )


def top_rated_providers(service_providers: DataFrame, provider_reviews: DataFrame) -> DataFrame:
    """A2/T2 (reference sql/service_seeker_kpis:1-10)."""
    return (
        provider_reviews.join(F.broadcast(service_providers), "provider_id")
        .groupBy("business_name", "location")
        .agg(F.round(F.avg("rating"), 2).alias("avg_rating"))
        .orderBy(F.desc("avg_rating"), "business_name")
        .limit(5)
    )
