import logging

import pytest


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (per driver contract)."""
    import ray
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def credit_cfg():
    from credit_ocr_backend_ray.config import default_config
    return default_config()["credit_request"]


@pytest.fixture(scope="session")
def canonical_form_lines():
    """The 44-line two-column German credit form — exact replica of the
    reference fixture (/root/reference/tests/test_field_extraction.py:154-201,
    spec in FIXTURES.md §3): labels x=0.5 conf 0.95, values x=3.0 y+0.01."""
    rows = [
        ("Firmenname", "DemoTech GmbH", 0.98),
        ("Rechtsform", "Gesellschaft mit beschränkter Haftung (GmbH)", 0.97),
        ("Gründungsdatum", "15.03.2018", 0.99),
        ("Geschäftsanschrift", "Hauptstraße 123, 70173 Stuttgart", 0.96),
        ("Handelsregisternummer / Gericht",
         "HRB 123456 / Amtsgericht Stuttgart", 0.97),
        ("USt-ID / Steuernummer", "DE123456789", 0.98),
        ("Website (optional)", "www.demotech.de", 0.99),
        ("Art der Immobilie", "Gewerbeimmobilie - Bürogebäude", 0.96),
        ("Objektbezeichnung", "InnovationsCampus Stuttgart", 0.97),
        ("Adresse", "Innovationsntraße 1, 70469 Stuttgart", 0.96),
        ("Kaufpreis / Baukosten", "4.200.000€", 0.98),
        ("Gewünschte Finanzierungssumme", "3.500.000€", 0.98),
        ("Verwendungszweck", "Kauf und Renovierung", 0.96),
        ("Eigenkapitalanteil", "700.000€", 0.98),
        ("Baujahr", "1995", 0.99),
        ("Fläche gesamt", "2.800 m²", 0.97),
        ("Gewünschte Darlehenssumme", "3.500.000€", 0.98),
        ("Laufzeit", "20 Jahre", 0.99),
        ("Ratenwunsch", "Ca. 18.000 € (monatlich)", 0.96),
        ("Zinssatz", "Festzins, 3.2% p.a.", 0.97),
        ("Sondertilgungen gewünscht", "[x] ja [ ] nein", 0.98),
        ("Öffentliche Fördermittel beantragt?", "[ ] ja [x] nein", 0.98),
    ]
    lines = []
    for k, (label, value, vconf) in enumerate(rows, start=1):
        lines.append({"type": "line", "text": label, "page": 1,
                      "bounding_box": [{"x": 0.5, "y": float(k)}] * 4,
                      "confidence": 0.95})
        lines.append({"type": "line", "text": value, "page": 1,
                      "bounding_box": [{"x": 3.0, "y": k + 0.01}] * 4,
                      "confidence": vconf})
    return lines
