"""Conformance ports of /root/reference/src/tables.rs:1152-1463 tests."""

from pdf_inspector_ray.pdfi.extract import TextItem
from pdf_inspector_ray.pdfi.tables import Table, detect_tables, table_to_markdown


def make_item(text, x, y, font_size):
    return TextItem(text, x, y, 10.0, font_size, "F1", font_size, 1,
                    False, False)


def test_table_detection():
    items = [
        make_item("Subject", 100.0, 500.0, 8.0),
        make_item("Q1", 200.0, 500.0, 8.0),
        make_item("Q2", 280.0, 500.0, 8.0),
        make_item("Q3", 360.0, 500.0, 8.0),
        make_item("Math", 100.0, 480.0, 8.0),
        make_item("9.0", 200.0, 480.0, 8.0),
        make_item("8.5", 280.0, 480.0, 8.0),
        make_item("9.5", 360.0, 480.0, 8.0),
        make_item("Science", 100.0, 460.0, 8.0),
        make_item("8.0", 200.0, 460.0, 8.0),
        make_item("9.0", 280.0, 460.0, 8.0),
        make_item("8.5", 360.0, 460.0, 8.0),
        make_item("English", 100.0, 440.0, 8.0),
        make_item("9.5", 200.0, 440.0, 8.0),
        make_item("9.0", 280.0, 440.0, 8.0),
        make_item("9.5", 360.0, 440.0, 8.0),
    ]
    tables = detect_tables(items, 10.0)
    assert len(tables) == 1
    assert len(tables[0].columns) == 4
    assert len(tables[0].rows) == 4


def test_table_to_markdown():
    table = Table([100.0, 200.0], [500.0, 480.0],
                  [["Header 1", "Header 2"], ["Cell 1", "Cell 2"]], [])
    md = table_to_markdown(table)
    assert "| Header 1" in md
    assert "| ---" in md
    assert "| Cell 1" in md


def test_body_font_table_detected():
    items = [
        make_item("Name", 100.0, 500.0, 10.0),
        make_item("Price", 200.0, 500.0, 10.0),
        make_item("Qty", 300.0, 500.0, 10.0),
        make_item("Total", 400.0, 500.0, 10.0),
        make_item("Widget", 100.0, 480.0, 10.0),
        make_item("5.00", 200.0, 480.0, 10.0),
        make_item("10", 300.0, 480.0, 10.0),
        make_item("50.00", 400.0, 480.0, 10.0),
        make_item("Gadget", 100.0, 460.0, 10.0),
        make_item("12.50", 200.0, 460.0, 10.0),
        make_item("4", 300.0, 460.0, 10.0),
        make_item("50.00", 400.0, 460.0, 10.0),
        make_item("Gizmo", 100.0, 440.0, 10.0),
        make_item("3.25", 200.0, 440.0, 10.0),
        make_item("20", 300.0, 440.0, 10.0),
        make_item("65.00", 400.0, 440.0, 10.0),
    ]
    tables = detect_tables(items, 10.0)
    assert len(tables) == 1, "Body-font table should be detected by Pass 2"
    assert len(tables[0].columns) == 4
    assert len(tables[0].rows) >= 3


def test_paragraph_not_falsely_detected():
    texts = [
        "This is a paragraph of text that spans the full width",
        "of the page and should not be detected as a table.",
        "It continues for several lines with normal body text",
        "that is left-aligned and has no columnar structure.",
        "The paragraph keeps going with more content here.",
        "And it has even more text on this line as well.",
        "Finally the paragraph concludes with this last line.",
        "One more line to have enough items for detection.",
        "And another line of plain paragraph text content.",
        "Last line of the paragraph ends here for the test.",
    ]
    items = [make_item(t, 72.0, 500.0 - i * 15.0, 10.0)
             for i, t in enumerate(texts)]
    assert detect_tables(items, 10.0) == []


def test_word_level_paragraph_not_detected_as_table():
    rows = [
        [("We", 72.0), ("would", 95.0), ("like", 145.0), ("to", 180.0),
         ("thank", 200.0), ("all", 250.0), ("the", 278.0),
         ("practitioners", 305.0)],
        [("and", 72.0), ("researchers", 105.0), ("across", 185.0),
         ("the", 232.0), ("University", 260.0), ("of", 335.0),
         ("Leeds", 355.0)],
        [("Libraries", 72.0), ("whose", 142.0), ("contributions", 190.0),
         ("made", 290.0), ("this", 328.0), ("report", 360.0)],
        [("possible", 72.0), ("Both", 140.0), ("constituent", 178.0),
         ("studies", 262.0), ("were", 315.0), ("approved", 350.0)],
    ]
    items = []
    for i, row in enumerate(rows):
        y = 500.0 - i * 15.0
        for text, x in row:
            items.append(make_item(text, x, y, 10.0))
    assert detect_tables(items, 10.0) == []


def test_large_data_table_not_rejected():
    items = [
        make_item("Temp", 100.0, 800.0, 8.0),
        make_item("Pressure", 200.0, 800.0, 8.0),
        make_item("Volume", 300.0, 800.0, 8.0),
        make_item("Enthalpy", 400.0, 800.0, 8.0),
    ]
    for i in range(1, 50):
        y = 800.0 - i * 12.0
        items.append(make_item(str(-40 + i * 2), 100.0, y, 8.0))
        items.append(make_item(f"{100.0 + i * 5.0:.1f}", 200.0, y, 8.0))
        items.append(make_item(f"{0.05 + i * 0.01:.3f}", 300.0, y, 8.0))
        items.append(make_item(f"{150.0 + i * 2.5:.1f}", 400.0, y, 8.0))
    tables = detect_tables(items, 10.0)
    assert len(tables) == 1, "Large data table should not be rejected"
    assert len(tables[0].rows) >= 40


def test_uniform_spacing_rows_not_merged():
    companies = [
        "SC Priority LLC", "Craft Roofing Co", "Alpha Roofing Inc",
        "Beta Construction", "Gamma Builders", "Delta Roofing",
        "Epsilon Contractors",
    ]
    items = [
        make_item("No.", 50.0, 800.0, 8.0),
        make_item("Company", 120.0, 800.0, 8.0),
        make_item("Bid Amount", 350.0, 800.0, 8.0),
    ]
    for i, company in enumerate(companies):
        y = 790.0 - i * 10.0
        items.append(make_item(str(i + 1), 50.0, y, 8.0))
        items.append(make_item(company, 120.0, y, 8.0))
        items.append(make_item(f"${100 + i * 10},000", 350.0, y, 8.0))
    tables = detect_tables(items, 12.0)
    assert len(tables) == 1
    assert len(tables[0].rows) == 8, \
        f"Each company must be on its own row, got {len(tables[0].rows)}"


def test_form_header_rows_skipped():
    """tables.rs:999-1115: leading rows with colon-label form patterns are
    excluded; the grid starts at the first dense/numeric row."""
    items = [
        # form metadata rows (colon labels, sparse)
        make_item("Name:", 100.0, 540.0, 8.0),
        make_item("Acme Corp", 220.0, 540.0, 8.0),
        make_item("Date:", 100.0, 524.0, 8.0),
        make_item("2026-01-01", 220.0, 524.0, 8.0),
        # real table: dense header + numeric data
        make_item("Item", 100.0, 500.0, 8.0),
        make_item("Qty", 200.0, 500.0, 8.0),
        make_item("Price", 300.0, 500.0, 8.0),
        make_item("Total", 400.0, 500.0, 8.0),
        make_item("Bolt", 100.0, 480.0, 8.0),
        make_item("10", 200.0, 480.0, 8.0),
        make_item("1.50", 300.0, 480.0, 8.0),
        make_item("15.00", 400.0, 480.0, 8.0),
        make_item("Nut", 100.0, 460.0, 8.0),
        make_item("20", 200.0, 460.0, 8.0),
        make_item("0.75", 300.0, 460.0, 8.0),
        make_item("15.00", 400.0, 460.0, 8.0),
        make_item("Washer", 100.0, 440.0, 8.0),
        make_item("30", 200.0, 440.0, 8.0),
        make_item("0.10", 300.0, 440.0, 8.0),
        make_item("3.00", 400.0, 440.0, 8.0),
    ]
    tables = detect_tables(items, 10.0)
    assert len(tables) == 1
    cells = tables[0].cells
    # the colon-label rows must not be part of the grid
    flat = " | ".join(c for row in cells for c in row)
    assert "Name:" not in flat
    assert "Date:" not in flat
    assert cells[0][0] == "Item"
