"""Seeded Olist-shaped CSV fixture generator (FIXTURES.md).

Every dirty-data knob the silver filters / quality gate exercise is
planted deliberately: multi-item orders, multi-payment + not_defined
rows, wrong-length review ids, out-of-range scores, special-char and
NULL comments, malformed creation dates, duplicate reviews per order,
null product category/weight/dims, heavily duplicated zip prefixes.
"""

from __future__ import annotations

import csv
import os
import random
from datetime import datetime, timedelta

STATES = ["SP", "RJ", "MG", "BA", "PR", "RS", "AM", "GO", "CE", "PE"]
CITIES = ["sao paulo", "rio de janeiro", "belo horizonte", "salvador", "curitiba"]
CATEGORIES = ["cama_mesa_banho", "beleza_saude", None, "esporte_lazer", "moveis_decoracao"]
PAYMENT_TYPES = ["credit_card", "boleto", "voucher", "debit_card"]
START = datetime(2016, 9, 1)


def _hex32(rng: random.Random) -> str:
    return "".join(rng.choice("0123456789abcdef") for _ in range(32))


def _ts(rng: random.Random, base: datetime, max_days: int = 700) -> datetime:
    return base + timedelta(
        days=rng.randint(0, max_days), hours=rng.randint(0, 23), minutes=rng.randint(0, 59)
    )


def generate(csv_dir: str, n_customers: int = 150, n_orders: int = 400, seed: int = 42):
    rng = random.Random(seed)
    os.makedirs(csv_dir, exist_ok=True)

    customers = []
    for _ in range(n_customers):
        zip_prefix = rng.choice(
            [rng.randint(1000, 99999), rng.randint(100, 999)]  # some out-of-band
        )
        customers.append(
            dict(
                customer_id=_hex32(rng),
                customer_unique_id=_hex32(rng),
                customer_zip_code_prefix=zip_prefix,
                customer_city=rng.choice(CITIES),
                customer_state=rng.choice(STATES),
            )
        )

    sellers = [
        dict(
            seller_id=_hex32(rng),
            seller_zip_code_prefix=rng.randint(1000, 99999),
            seller_city=rng.choice(CITIES),
            seller_state=rng.choice(STATES),
        )
        for _ in range(30)
    ]

    products = []
    for _ in range(60):
        has_dims = rng.random() > 0.15
        products.append(
            dict(
                product_id=_hex32(rng),
                product_category_name=rng.choice(CATEGORIES),
                product_name_lenght=rng.randint(10, 60),
                product_description_lenght=rng.randint(50, 900),
                product_photos_qty=rng.randint(1, 8),
                product_weight_g=rng.choice([None, rng.randint(50, 5000)]),
                product_length_cm=rng.randint(5, 100) if has_dims else None,
                product_height_cm=rng.randint(2, 60) if has_dims else None,
                product_width_cm=rng.randint(5, 60) if has_dims else None,
            )
        )

    orders, items, payments, reviews = [], [], [], []
    statuses = ["delivered"] * 7 + ["shipped", "processing", "canceled", "unavailable",
                                    "invoiced", "created", "approved"]
    for _ in range(n_orders):
        oid = _hex32(rng)
        cust = rng.choice(customers)
        purchase = _ts(rng, START)
        approved = None if rng.random() < 0.1 else purchase + timedelta(hours=rng.randint(1, 48))
        delivered = (
            None
            if rng.random() < 0.2
            else purchase + timedelta(days=rng.randint(2, 30))
        )
        orders.append(
            dict(
                order_id=oid,
                customer_id=cust["customer_id"],
                order_status=rng.choice(statuses),
                order_purchase_timestamp=purchase,
                order_approved_at=approved,
                order_delivered_carrier_date=(
                    None if delivered is None else delivered - timedelta(days=1)
                ),
                order_delivered_customer_date=delivered,
                order_estimated_delivery_date=purchase + timedelta(days=rng.randint(10, 40)),
            )
        )
        for item_no in range(1, rng.choice([1, 1, 1, 2, 2, 3, 4]) + 1):
            prod = rng.choice(products)
            items.append(
                dict(
                    order_id=oid,
                    order_item_id=item_no,
                    product_id=prod["product_id"],
                    seller_id=rng.choice(sellers)["seller_id"],
                    shipping_limit_date=purchase + timedelta(days=5),
                    price=round(rng.uniform(10, 500), 2),
                    freight_value=round(rng.uniform(0, 60), 2),
                )
            )
        for seq in range(1, rng.choice([1, 1, 1, 2, 3]) + 1):
            payments.append(
                dict(
                    order_id=oid,
                    payment_sequential=seq,
                    payment_type=(
                        "not_defined" if rng.random() < 0.05 else rng.choice(PAYMENT_TYPES)
                    ),
                    payment_installments=rng.randint(0, 24),
                    payment_value=round(rng.uniform(10, 600), 2),
                )
            )
        # Reviews: some orders none, some several (dup Ord_ID knob).
        for _ in range(rng.choice([0, 1, 1, 1, 2])):
            dirty = rng.random()
            if dirty < 0.06:
                rid = _hex32(rng)[: rng.choice([16, 30, 33])]  # wrong length
            else:
                rid = _hex32(rng)
            score = rng.choice([0, 6]) if dirty < 0.1 else rng.randint(1, 5)
            comment = rng.choice(
                [
                    None,  # P5 NULL trap — must be present
                    "Great product, arrived on time!",
                    "Produto excelente, recomendo ç é ã!",  # special chars -> dropped
                    "ok",
                    "Five stars. Would buy again, really good.",
                ]
            )
            title = rng.choice([None, "Nice", "Péssimo!", "Good value"])
            creation = (
                "13/05/2017 00:00"  # malformed date knob
                if dirty < 0.08
                else _ts(rng, START).strftime("%Y-%m-%d %H:%M:%S")
            )
            reviews.append(
                dict(
                    review_id=rid,
                    order_id=oid,
                    review_score=score,
                    review_comment_title=title,
                    review_comment_message=comment,
                    review_creation_date=creation,
                    review_answer_timestamp=_ts(rng, START + timedelta(days=3)),
                )
            )

    geolocation = []
    for _ in range(400):
        geolocation.append(
            dict(
                geolocation_zip_code_prefix=rng.choice(
                    [c["customer_zip_code_prefix"] for c in customers]
                    + [s["seller_zip_code_prefix"] for s in sellers]
                ),
                geolocation_lat=round(rng.uniform(-33.0, 4.0), 6),
                geolocation_lng=round(rng.uniform(-73.0, -35.0), 6),
                geolocation_city=rng.choice(CITIES),
                geolocation_state=rng.choice(STATES),
            )
        )

    translation = [
        dict(product_category_name=c, product_category_name_english=c.replace("_", " "))
        for c in CATEGORIES
        if c
    ]

    tables = dict(
        customers=customers,
        orders=orders,
        order_items=items,
        order_payments=payments,
        order_reviews=reviews,
        products=products,
        sellers=sellers,
        geolocation=geolocation,
        product_category_name_translation=translation,
    )
    for name, rows in tables.items():
        path = os.path.join(csv_dir, f"{name}.csv")
        with open(path, "w", newline="", encoding="utf-8") as fh:
            writer = csv.DictWriter(fh, fieldnames=list(rows[0].keys()))
            writer.writeheader()
            for r in rows:
                writer.writerow(
                    {
                        k: (v.strftime("%Y-%m-%d %H:%M:%S") if isinstance(v, datetime) else
                            ("" if v is None else v))
                        for k, v in r.items()
                    }
                )
    return tables
