"""Deterministic synthetic stage-day generator for all ten entities.

The reference ships a one-entity generator (`menu.py`: 20,000 menu
rows, restaurants 100-150, price U(50,500), dates 2023-01-01..
2025-02-27, seedless). This is the full-pipeline equivalent: every
entity, reference file names (`final_proc.sql:19-28`), the
`YYYY/M/D/` landing layout (`task_proc.sql:14-22`), and a fixed seed
so runs are reproducible. Day N>1 emits a delta (a slice of updated
rows + some new keys) so SCD paths get exercised.

Usage:
    python tools/datagen.py --root /tmp/stage --date 2024-05-01 \
        --orders 50000 [--day2-frac 0.1]

Then:
    from real_time_data_pipeline_for_restaurant_analytics_spark.pipeline.runner import Warehouse, run_all
    run_all(spark, Warehouse(path), "/tmp/stage/2024/5/1/")
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import random
from datetime import date, timedelta

CATEGORIES = ["Appetizers", "Main Course", "Desserts", "Beverages", "Snacks"]
ITEMS = {
    "Appetizers": ["Samosa", "Paneer Tikka", "Chicken Tikka", "Spring Rolls"],
    "Main Course": ["Butter Chicken", "Dal Makhani", "Biryani", "Palak Paneer"],
    "Desserts": ["Gulab Jamun", "Kheer", "Jalebi", "Kulfi"],
    "Beverages": ["Masala Chai", "Lassi", "Cold Coffee", "Nimbu Pani"],
    "Snacks": ["Pav Bhaji", "Vada Pav", "Dhokla", "Kachori"],
}
NON_VEG = {"Chicken Tikka", "Butter Chicken", "Biryani"}
STATES = [("Maharashtra", "Mumbai"), ("Delhi", "Delhi"), ("Karnataka", "Bengaluru"),
          ("Tamil Nadu", "Chennai"), ("Telangana", "Hyderabad"), ("Goa", "Panaji")]
STATUSES = ["Delivered", "Delivered", "Delivered", "Cancelled", "In Transit"]
PAYMENT = ["Card", "UPI", "Cash", "Wallet"]


def _d(rng: random.Random, start=date(2023, 1, 1), days=700) -> str:
    return (start + timedelta(days=rng.randint(0, days))).isoformat()


def _rows_csv(path: str, header: list[str], rows: list[list]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows)


def generate_day(root: str, day: date, n_orders: int, seed: int = 42,
                 delta_frac: float = 0.0) -> str:
    """Write one stage day; delta_frac>0 marks a delta day (that
    fraction of keys re-emitted with modified attributes)."""
    rng = random.Random((seed, day.toordinal()).__hash__())
    prefix = os.path.join(root, f"{day.year}/{day.month}/{day.day}/")
    n_cust = max(50, n_orders // 10)
    n_rest = 51
    n_loc = len(STATES)
    n_menu = max(200, n_orders // 100)
    n_agents = max(20, n_orders // 500)
    created = day.isoformat() + " 09:00:00"

    def keys(n: int) -> list[int]:
        if delta_frac <= 0:
            return list(range(1, n + 1))
        upd = rng.sample(range(1, n + 1), max(1, int(n * delta_frac)))
        new = list(range(n + 1, n + 1 + max(1, int(n * delta_frac / 2))))
        return sorted(upd + new)

    _rows_csv(prefix + "location.csv",
              ["LocationID", "State", "City", "ZipCode", "ActiveFlag", "CreatedDate", "ModifiedDate"],
              [[i, *STATES[(i - 1) % n_loc], 400000 + i, "Y", created, created]
               for i in keys(n_loc)])

    _rows_csv(prefix + "restaurant.csv",
              ["RestaurantID", "Name", "CuisineType", "Pricing_for_2", "Restaurant_Phone",
               "OperatingHours", "LocationID", "ActiveFlag", "OpenStatus", "Locality",
               "Restaurant_Address", "Ratings", "Coupons", "Latitude", "Longitude",
               "CreatedDate", "ModifiedDate"],
              [[100 + i, f"Restaurant {100 + i}", rng.choice(["North Indian", "South Indian", "Chinese"]),
                rng.randrange(300, 1500, 50), f"98{rng.randint(10**7, 10**8 - 1)}",
                "10:00-23:00", 1 + i % n_loc, "Y", "Open", f"Sector {i % 40}",
                f"{i} Food Street", round(rng.uniform(2.5, 5.0), 1),
                json.dumps({"flat": rng.choice([10, 20, 30])}),
                round(rng.uniform(8.0, 28.0), 6), round(rng.uniform(68.0, 97.0), 6),
                created, created]
               for i in keys(n_rest)])

    _rows_csv(prefix + "menu_items.csv",  # `final_proc.sql:21`
              ["MenuID", "RestaurantID", "ItemName", "Description", "Price", "Category",
               "Availability", "ItemType", "Rating", "CreatedDate", "ModifiedDate"],
              [(lambda cat, item: [i, 100 + i % n_rest, item, f"Classic {item}.",
                round(rng.uniform(50, 500), 2), cat, "true",
                "Non-Veg" if item in NON_VEG else "Veg",
                round(rng.uniform(1, 5), 1), _d(rng), _d(rng)])
               (cat := rng.choice(CATEGORIES), rng.choice(ITEMS[cat]))
               for i in keys(n_menu)])

    _rows_csv(prefix + "customer.csv",
              ["CustomerID", "Name", "Email", "Mobile", "LoginByUsing", "Gender", "DOB",
               "Anniversary", "Rating", "Preferences", "CreatedDate", "ModifiedDate"],
              [[i, f"Customer {i}", f"c{i}@example.com", f"99{rng.randint(10**7, 10**8 - 1)}",
                rng.choice(["Email", "Gmail", "Facebook"]), rng.choice(["M", "F", "Other"]),
                _d(rng, date(1970, 1, 1), 12000), _d(rng, date(2000, 1, 1), 8000),
                round(rng.uniform(1, 5), 1), json.dumps({"veg": rng.choice([True, False])}),
                created, created]
               for i in keys(n_cust)])

    _rows_csv(prefix + "customer_address.csv",
              ["AddressID", "CustomerID", "FlatNo", "Floor", "Building", "Landmark",
               "Locality", "City", "State", "Pincode", "Coordinates", "PrimaryFlag",
               "AddressType", "CreatedDate", "ModifiedDate"],
              [[i, 1 + i % n_cust, f"{i % 200}", f"{i % 20}", f"Tower {i % 9}", "Near Park",
                f"Sector {i % 40}", STATES[i % n_loc][1], STATES[i % n_loc][0],
                110000 + i % 900, f"{round(rng.uniform(8, 28), 4)},{round(rng.uniform(68, 97), 4)}",
                "Y" if i % 3 == 0 else "N", rng.choice(["Home", "Work"]), created, created]
               for i in keys(n_cust)])

    with open(prefix + "delivery_agent.json", "w") as f:  # `final_proc.sql:25`
        for i in keys(n_agents):
            f.write(json.dumps({
                "DeliveryAgentID": str(i), "Full_Name": f"Agent {i}",
                "EMAIL": f"agent{i}@example.com", "Mobile_No": f"97{rng.randint(10**7, 10**8 - 1)}",
                "VehicleType": rng.choice(["Bike", "Scooter", "Cycle"]),
                "LocationID": str(1 + i % n_loc), "Status": "Active",
                "Gender": rng.choice(["M", "F"]), "Rating": str(round(rng.uniform(1, 5), 1)),
                "CreatedDate": created, "ModifiedDate": created}) + "\n")

    order_keys = keys(n_orders)
    _rows_csv(prefix + "orders.csv",
              ["OrderID", "CustomerID", "RestaurantID", "OrderDate", "TotalAmount",
               "DiscountAmount", "DeliveryCharges", "FinalAmount", "Status",
               "PaymentMethod", "IsFirstOrder", "CouponCode", "CreatedDate", "ModifiedDate"],
              [(lambda total: [i, 1 + i % n_cust, 100 + i % n_rest,
                f"{day} {10 + i % 12}:{i % 60:02d}:00", total, 5.0, 20.0,
                round(total + 15.0, 2), rng.choice(STATUSES), rng.choice(PAYMENT),
                "true" if i % 7 == 0 else "false",
                "SAVE10" if i % 3 == 0 else "", created, created])
               (round(rng.uniform(100, 1500), 2))
               for i in order_keys])

    _rows_csv(prefix + "order_items.csv",  # `final_proc.sql:23`
              ["OrderItemID", "OrderID", "MenuItemID", "Quantity", "Price", "Subtotal",
               "Ratings", "CreatedDate", "ModifiedDate"],
              [(lambda q, p: [oi_id, o, 1 + (o * 3 + j) % n_menu, q, p,
                              round(q * p, 2), 1 + (o + j) % 5, created, created])
               (1 + (o + j) % 3, round(rng.uniform(50, 500), 2))
               for oi_id, (o, j) in enumerate(
                   ((o, j) for o in order_keys for j in range(1 + o % 3)), start=1)])

    _rows_csv(prefix + "delivery.csv",
              ["DeliveryID", "OrderID", "DeliveryAgentID", "DeliveryStatus", "EstimatedTime",
               "DeliveredTime", "AddressID", "DeliveryDate", "CreatedDate", "ModifiedDate"],
              [[i, o, 1 + o % n_agents, rng.choice(["Delivered", "Delivered", "Returned"]),
                f"{rng.randint(20, 60)} mins", f"{rng.randint(20, 90)} mins",
                1 + o % n_cust, f"{day} {11 + o % 12}:{o % 60:02d}:00", created, created]
               for i, o in enumerate(order_keys, start=1)])

    _rows_csv(prefix + "login_audit.csv",
              ["LoginID", "CustomerID", "LoginType", "DeviceInterface", "MobileDeviceName",
               "WebInterface", "LastLogin"],
              [[i, 1 + i % n_cust, rng.choice(["App", "Web"]),
                rng.choice(["iOS", "Android", ""]), rng.choice(["iPhone 14", "Pixel 8", ""]),
                rng.choice(["Chrome", "Safari", ""]), f"{day} {i % 24}:{i % 60:02d}:00"]
               for i in keys(n_cust * 2)])
    return prefix


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--date", default=None, help="YYYY-MM-DD (default today)")
    ap.add_argument("--orders", type=int, default=20000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--day2-frac", type=float, default=0.0,
                    help=">0 writes a delta day (fraction of keys updated)")
    args = ap.parse_args()
    d = date.fromisoformat(args.date) if args.date else date.today()
    prefix = generate_day(args.root, d, args.orders, args.seed, args.day2_frac)
    print(prefix)


if __name__ == "__main__":
    main()
