SELECT COUNT(*) FROM so_user as u, account as acc, badge as b
WHERE u.account_id = acc.id AND b.user_id = u.id AND b.site_id = u.site_id
  AND acc.website_url <> '' AND b.date >= '2012-01-01 00:00:00'::timestamp
  AND u.reputation >= 300;
