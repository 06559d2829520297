SELECT COUNT(*) FROM site as s, so_user as u, account as acc
WHERE u.site_id = s.site_id AND u.account_id = acc.id
  AND s.site_name = 'askubuntu' AND acc.location = 'Germany';
