"""Bronze→silver transform tests on tiny in-memory feeds, mirroring
reference tests/test_graph_transformer.py (1 contact, 1 company,
1 deal, engagements, email events, form submissions with known
cross-links) plus the semantic edge cases the reference encodes:
'true'-string bools, NOTE body [:200] truncation, archived→active
inversion, null→''/0 conventions, email-matched edge resolution."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from hubspot_neo4j_pipeline_spark.operators.transforms import (
    resolve_email_edges,
    transform_all,
    transform_contacts,
    transform_deals,
    transform_email_events,
    transform_engagements,
    transform_form_submissions,
    transform_users,
)
from hubspot_neo4j_pipeline_spark.sources.feeds import FEED_SCHEMAS


@pytest.fixture(scope="module")
def feeds(spark):
    contacts = [
        {
            "id": "c1",
            "properties": {
                "email": " John@Example.COM ",
                "firstname": "John",
                "lastname": "Doe",
                "lifecyclestage": "customer",
                "createdate": "2024-01-02T00:00:00Z",
                "hubspot_owner_id": "u1",
                "associatedcompanyid": "co1",
                "hs_email_open": "7",
                "hs_email_click": "not_a_number",
                "hs_analytics_last_url": "https://www.site.com/page",
            },
            "associations": {"deals": [{"id": "d1"}]},
            "created_at": None,
            "updated_at": None,
        },
        {
            "id": "c2",
            "properties": {"email": "jane@x.io", "firstname": "Jane"},
            "associations": None,
            "created_at": None,
            "updated_at": None,
        },
    ]
    companies = [
        {
            "id": "co1",
            "properties": {
                "name": "Acme",
                "domain": "WWW.Acme.com",
                "numberofemployees": "250",
                "annualrevenue": "1000000.5",
                "hubspot_owner_id": "u1",
            },
        }
    ]
    deals = [
        {
            "id": "d1",
            "properties": {
                "dealname": "Big Deal",
                "amount": "5000.25",
                "dealstage": "closedwon",
                "hs_is_closed_won": "True",
            },
            "associations": {"companies": [{"id": "co1"}], "contacts": [{"id": "c1"}]},
        },
        {
            "id": "d2",
            "properties": {"dealname": "Open Deal", "amount": "bogus"},
            "associations": None,
        },
    ]
    engagements = [
        {
            "id": "e1",
            "properties": {
                "hs_engagement_type": "NOTE",
                "hs_note_body": "x" * 500,
                "hs_createdate": "2024-02-01T10:00:00Z",
            },
            "associations": {"contacts": [{"id": "c1"}], "companies": None, "deals": None},
        },
        {
            "id": "e2",
            "properties": {
                "hs_engagement_type": "CALL",
                "hs_call_title": "Intro call",
                "hs_call_duration": "360000",
                "hs_timestamp": "2024-02-02T10:00:00Z",
            },
            "associations": {"contacts": None, "companies": None, "deals": [{"id": "d1"}]},
        },
    ]
    users = [
        {
            "id": "u1",
            "email": "Owner@Corp.com",
            "first_name": "Olivia",
            "last_name": "Owner",
            "archived": False,
            "user_id": "101",
            "teams": [{"name": "Sales"}, {"name": "EMEA"}],
            "created_at": "2023-01-01T00:00:00Z",
            "updated_at": None,
        },
        {
            "id": "u2",
            "email": "old@corp.com",
            "first_name": "Ora",
            "last_name": "Old",
            "archived": True,
            "user_id": None,
            "teams": None,
            "created_at": None,
            "updated_at": None,
        },
    ]
    email_events = [
        {
            "id": "ev1",
            "event_type": "OPEN",
            "recipient": "John@Example.com",
            "created": "1706745600000",
            "emailCampaignId": "camp1",
            "emailCampaignName": "Launch",
            "subject": "Hello",
            "deviceType": "COMPUTER",
            "location": {"city": "Berlin"},
            "userAgent": "UA",
            "url": None,
        },
        {
            "id": "ev2",
            "event_type": "CLICK",
            "recipient": "john@example.com",
            "created": "1706832000000",
            "emailCampaignId": "camp1",
            "emailCampaignName": "Launch",
            "subject": "Hello",
            "deviceType": "MOBILE",
            "location": None,
            "userAgent": "UA",
            "url": "https://www.site.com/landing",
        },
        {  # filtered out: SENT type
            "id": "ev3",
            "event_type": "SENT",
            "recipient": "john@example.com",
            "created": "1706700000000",
            "emailCampaignId": "camp1",
            "emailCampaignName": None,
            "subject": None,
            "deviceType": None,
            "location": None,
            "userAgent": None,
            "url": None,
        },
        {  # filtered out: no recipient
            "id": "ev4",
            "event_type": "OPEN",
            "recipient": None,
            "created": "1706700000001",
            "emailCampaignId": "camp1",
            "emailCampaignName": None,
            "subject": None,
            "deviceType": None,
            "location": None,
            "userAgent": None,
            "url": None,
        },
    ]
    form_submissions = [
        {
            "form_guid": "f1",
            "form_name": "Contact Us",
            "submitted_at": 1706900000000,
            "page_url": "https://www.site.com/contact",
            "page_title": "Contact",
            "ip_address": "1.2.3.4",
            "values": [
                {"name": "email", "value": "John@Example.com"},
                {"name": "message", "value": "hi"},
            ],
        },
        {
            "form_guid": "f1",
            "form_name": "Contact Us",
            "submitted_at": 1706900001000,
            "page_url": "https://www.site.com/contact",
            "page_title": "Contact",
            "ip_address": "5.6.7.8",
            "values": [{"name": "email", "value": "stranger@nowhere.com"}],
        },
    ]
    raw = {
        "contacts": contacts,
        "companies": companies,
        "deals": deals,
        "engagements": engagements,
        "users": users,
        "email_events": email_events,
        "form_submissions": form_submissions,
    }
    return {
        name: spark.createDataFrame(rows, FEED_SCHEMAS[name])
        for name, rows in raw.items()
    }


def test_contact_projection_semantics(feeds):
    node, edges = transform_contacts(feeds["contacts"])
    rows = {r["hubspot_id"]: r for r in node.collect()}
    c1 = rows["c1"]
    assert c1["email"] == "john@example.com"  # cleaned
    assert c1["total_email_opens"] == 7
    assert c1["total_email_clicks"] == 0  # garbage → 0
    assert c1["lifecycle_stage"] == "customer"
    assert rows["c2"]["last_name"] == ""  # missing → ''
    by_type = {
        (r["rel_type"], r["from_id"], r["to_id"]) for r in edges.collect()
    }
    assert ("OWNED_BY", "c1", "u1") in by_type
    assert ("WORKS_AT", "c1", "co1") in by_type
    assert ("ASSOCIATED_WITH", "c1", "d1") in by_type
    assert ("VISITED", "c1", "https://www.site.com/page") in by_type
    assert not any(t[1] == "c2" for t in by_type)  # c2 emits no edges


def test_deal_bool_and_safe_float(feeds):
    node, edges = transform_deals(feeds["deals"])
    rows = {r["hubspot_id"]: r for r in node.collect()}
    assert rows["d1"]["is_won"] is True  # 'True' string compare
    assert rows["d2"]["is_won"] is False  # default 'false'
    assert rows["d1"]["amount"] == 5000.25
    assert rows["d2"]["amount"] == 0.0  # bogus → 0.0
    assert rows["d2"]["pipeline"] == "default"
    e = {(r["rel_type"], r["from_id"], r["to_id"]) for r in edges.collect()}
    assert ("BELONGS_TO", "d1", "co1") in e
    assert ("ASSOCIATED_WITH", "c1", "d1") in e  # reverse direction


def test_engagement_type_dispatch(feeds):
    node, edges = transform_engagements(feeds["engagements"])
    rows = {r["hubspot_id"]: r for r in node.collect()}
    assert len(rows["e1"]["details"]) == 200  # NOTE body [:200]
    assert len(rows["e1"]["body"]) == 500
    assert rows["e2"]["details"] == "Intro call"
    assert rows["e2"]["duration"] == 360000
    e = {(r["rel_type"], r["from_id"], r["to_id"]) for r in edges.collect()}
    assert ("INVOLVES", "e1", "c1") in e
    assert ("RELATED_TO", "e2", "d1") in e


def test_user_archived_inversion_and_teams(feeds):
    node = transform_users(feeds["users"])
    rows = {r["hubspot_id"]: r for r in node.collect()}
    assert rows["u1"]["active"] is True and rows["u1"]["archived"] is False
    assert rows["u2"]["active"] is False and rows["u2"]["archived"] is True
    assert rows["u1"]["teams"] == "Sales, EMEA"
    assert rows["u2"]["teams"] == ""
    assert rows["u2"]["user_id"] == ""  # null → ''


def test_email_event_filter_and_campaign_dedup(feeds):
    opens, clicks, campaigns, edges = transform_email_events(feeds["email_events"])
    assert opens.count() == 1  # SENT + no-recipient filtered
    assert clicks.count() == 1
    camp = campaigns.collect()
    assert len(camp) == 1 and camp[0]["name"] == "Launch"  # D2 dedup
    click = clicks.collect()[0]
    assert click["clicked_url"] == "https://www.site.com/landing"
    assert click["location"] == ""  # null location struct → ''
    e = edges.collect()
    assert {r["rel_type"] for r in e} == {"PERFORMED", "FOR_CAMPAIGN", "CLICKED_URL"}
    performed = [r for r in e if r["rel_type"] == "PERFORMED"]
    assert all(r["from_email"] == "john@example.com" for r in performed)


def test_form_submission_email_match(feeds):
    contacts_node, _ = transform_contacts(feeds["contacts"])
    node, edges = transform_form_submissions(
        feeds["form_submissions"], contacts_node
    )
    assert node.count() == 2
    submitted = [r for r in edges.collect() if r["rel_type"] == "SUBMITTED_BY"]
    assert len(submitted) == 1  # stranger@ didn't match (A11 unmatched)
    assert submitted[0]["to_id"] == "c1"


def test_transform_all_end_to_end(feeds):
    nodes, edges = transform_all(feeds)
    counts = {k: df.count() for k, df in nodes.items()}
    assert counts["HUBSPOT_Contact"] == 2
    assert counts["HUBSPOT_User"] == 2
    assert counts["HUBSPOT_Deal"] == 2
    assert counts["HUBSPOT_WebPage"] == 3  # page, landing, contact (deduped)
    # all email-keyed edges resolved to ids
    assert edges.where("from_email is not null").count() == 0
    performed = edges.where("rel_type = 'PERFORMED'").collect()
    assert len(performed) == 2 and all(r["from_id"] == "c1" for r in performed)
    # deterministic event ids: re-running yields identical ids
    nodes2, _ = transform_all(feeds)
    ids1 = {r["hubspot_id"] for r in nodes["HUBSPOT_EmailOpenEvent"].collect()}
    ids2 = {r["hubspot_id"] for r in nodes2["HUBSPOT_EmailOpenEvent"].collect()}
    assert ids1 == ids2


def test_webpage_derivation(feeds):
    nodes, _ = transform_all(feeds)
    pages = {r["url"]: r for r in nodes["HUBSPOT_WebPage"].collect()}
    p = pages["https://www.site.com/page"]
    assert p["domain"] == "www.site.com" and p["path"] == "/page"
