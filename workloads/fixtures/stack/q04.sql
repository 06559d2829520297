SELECT COUNT(*) FROM question as q, so_user as u
WHERE q.owner_user_id = u.id AND q.site_id = u.site_id
  AND u.reputation >= 500 AND q.creation_date >= '2012-01-01 00:00:00'::timestamp;
