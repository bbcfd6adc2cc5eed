"""Deterministic PROX-shaped fixture generator (seed=42).

Synthesizes the FIXTURES.md §A tables as in-memory DataFrames for the
pipeline/KPI tests — the role the reference's Faker-generated
``dummy_data_v2/*.csv`` seed data plays (reference repo; counts in
SURVEY.md §5.1). Injects, per FIXTURES.md conventions, deterministic orphaned FK
values (exercises the FK checker) and ~2% exact duplicate rows
(exercises dedup). Scaled-down row counts keep tests fast.
"""

from __future__ import annotations

import datetime as dt
import random
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession

from prox_spark.schemas import SILVER_SCHEMAS

EPOCH = dt.datetime(2024, 1, 1)

ROLES = ["service_provider", "service_seeker", "admin"]
USER_STATUS = ["fresh", "verified", "suspended", "active", "deleted"]
BOOKING_STATUS = ["PENDING", "ACCEPTED", "IN_PROGRESS", "COMPLETED", "DECLINED"]
PAY_STATUS = ["pending", "paid", "failed", "refunded"]
PRICING = ["Hourly", "Fixed", "Project-based"]
VERIF = ["PENDING", "VERIFIED", "REJECTED", "SUSPENDED"]
CITIES = ["Accra", "Kumasi", "Tamale", "Takoradi", "Cape Coast"]
SENTIMENT = ["POSITIVE", "NEUTRAL", "NEGATIVE"]


def _ts(rng: random.Random, days: int = 365) -> dt.datetime:
    return EPOCH + dt.timedelta(seconds=rng.randrange(days * 86400))


def fixture_rows(
    n_users: int = 60,
    n_providers: int = 20,
    n_categories: int = 6,
    n_services: int = 50,
    n_bookings: int = 80,
    seed: int = 42,
) -> dict[str, list]:
    """Pure-Python row synthesis (no Spark dependency) so the same
    deterministic rows can back both in-memory DataFrames (tests) and
    the parquet fixture store the driver's DuckDB oracle reads
    (prox_spark/fixture_store.py). Includes the ~2% exact-duplicate
    injection — identical trailing rng consumption keeps values
    byte-stable against the pre-refactor generator."""
    rng = random.Random(seed)
    users = [
        (
            i, f"user{i}@example.com", "pw", f"First{i}", f"Last{i}",
            rng.choice(ROLES), f"http://pics/{i}.png", f"+233-{i:07d}",
            rng.choice(USER_STATUS), None, _ts(rng), _ts(rng),
        )
        for i in range(1, n_users + 1)
    ]
    providers = [
        (
            i, rng.randrange(1, n_users + 1), f"Biz {i}", f"biz{i}@example.com",
            f"+233-9{i:06d}", f"Provider {i} long description", rng.choice(CITIES),
            round(rng.uniform(4.5, 11.0), 6), round(rng.uniform(-3.5, 1.5), 6),
            f"Addr {i}", rng.choice(PRICING), rng.choice(VERIF),
            rng.random() < 0.3, _ts(rng), _ts(rng),
        )
        for i in range(1, n_providers + 1)
    ]
    categories = [
        (i, f"Category {i}", f"cat {i} desc", "ACTIVE", _ts(rng), _ts(rng))
        for i in range(1, n_categories + 1)
    ]
    provider_categories = [
        (p, rng.randrange(1, n_categories + 1), _ts(rng))
        for p in range(1, n_providers + 1)
        for _ in range(rng.randrange(1, 3))
    ]
    services = [
        (
            i, rng.randrange(1, n_providers + 1), rng.randrange(1, n_categories + 1),
            f"Service {i % 7}", f"svc {i} desc",
            Decimal(rng.randrange(1000, 50000)) / 100,
            '{"mon": "9-5", "tue": "9-5"}', _ts(rng), _ts(rng),
        )
        for i in range(1, n_services + 1)
    ]
    quote_responses = [
        (
            i, i, rng.randrange(1, n_providers + 1), rng.randrange(1, n_users + 1),
            f"Seeker {i}", f"+233-8{i:06d}", str(rng.randrange(1, n_categories + 1)),
            round(rng.uniform(10, 500), 2), 0.0, 0.0,
            (EPOCH + dt.timedelta(days=rng.randrange(30, 90))).date(),
            rng.choice(["PENDING", "ACCEPTED", "COMPLETED"]), None, _ts(rng), _ts(rng),
        )
        for i in range(1, n_bookings + 1)
    ]
    quote_responses = [
        (*r[:8], round(r[7] * 0.15, 2), round(r[7] * 1.15, 2), *r[10:]) for r in quote_responses
    ]
    bookings = [
        (
            i,
            # every 40th booking gets an orphan service_id (FK checker fodder)
            n_services + 1000 if i % 40 == 0 else rng.randrange(1, n_services + 1),
            rng.randrange(1, n_users + 1), rng.randrange(1, n_providers + 1),
            rng.randrange(1, n_categories + 1), i, f"booking {i}", rng.choice(CITIES),
            rng.choice(BOOKING_STATUS), _ts(rng),
            (EPOCH + dt.timedelta(days=rng.randrange(365))).date(),
            f"{rng.randrange(8, 18):02d}:00:00",
            (EPOCH + dt.timedelta(days=rng.randrange(365))).date(),
            None, _ts(rng), _ts(rng),
        )
        for i in range(1, n_bookings + 1)
    ]
    quote_items = [
        (
            j, rng.randrange(1, n_bookings + 1), f"item {j}",
            rng.randrange(1, 5), round(rng.uniform(5, 100), 2),
        )
        for j in range(1, n_bookings * 2 + 1)
    ]
    payments = [
        (
            i, rng.randrange(1, n_bookings + 1), 10_000 + i,
            Decimal(rng.randrange(1000, 60000)) / 100,
            rng.choice(PAY_STATUS), _ts(rng), _ts(rng),
        )
        for i in range(1, n_bookings + 1)
    ]
    reviews = [
        (
            i, rng.randrange(1, n_providers + 1), rng.randrange(1, n_users + 1),
            float(rng.randrange(1, 6)), f"review text {i}",
            rng.random() < 0.2, rng.random() < 0.05, _ts(rng),
        )
        for i in range(1, n_bookings // 2 + 1)
    ]
    disputes = [
        (
            i, rng.randrange(1, n_bookings + 1), rng.randrange(1, len(reviews) + 1),
            rng.randrange(1, n_users + 1), f"reason {i % 5}",
            rng.choice(["open", "resolved", "closed"]), _ts(rng), _ts(rng),
        )
        for i in range(1, n_bookings // 4 + 1)
    ]
    sentiments = [
        (i, rng.choice(SENTIMENT), round(rng.random(), 4), rng.random() < 0.1)
        for i in range(1, len(reviews) + 1)
    ]

    data: dict[str, list] = {
        "users": users,
        "service_providers": providers,
        "categories": categories,
        "provider_categories": provider_categories,
        "services": services,
        "bookings": bookings,
        "quote_response": quote_responses,
        "quote_item": quote_items,
        "payment_records": payments,
        "provider_reviews": reviews,
        "dispute_requests": disputes,
        "feedback_sentiment": sentiments,
    }
    out: dict[str, list] = {}
    for name, rows in data.items():
        # ~2% exact duplicates (dedup fodder)
        dups = [r for r in rows if rng.random() < 0.02]
        out[name] = rows + dups
    return out


def make_fixtures(
    spark: SparkSession,
    n_users: int = 60,
    n_providers: int = 20,
    n_categories: int = 6,
    n_services: int = 50,
    n_bookings: int = 80,
    seed: int = 42,
) -> dict[str, DataFrame]:
    rows = fixture_rows(n_users, n_providers, n_categories, n_services, n_bookings, seed)
    return {
        name: spark.createDataFrame(rows[name], SILVER_SCHEMAS[name]) for name in rows
    }
